package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off sf10 diagnostic for the gr2 disk exhaustion: how many wedge
  * rows exist, and how many survive the broadcast-Bloom prefilter —
  * counts only (no exchange, no sort, no disk risk), so the culprit
  * stage is identified without reproducing the failure.
  *
  *   runMain graft.tools.TriangleDiag [sfDir]
  */
object TriangleDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tridiag] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
      r
    }

    val und = graft.queries.GraphQueries.copurchase(spark, sfDir)
      .select(least(col("src"), col("dst")).as("__u"),
        greatest(col("src"), col("dst")).as("__v"))
      .filter(col("__u") =!= col("__v"))
      .distinct()
    val deg = und.select(col("__u").as("__id"))
      .union(und.select(col("__v").as("__id")))
      .groupBy("__id").agg(count(lit(1)).as("__deg"))
    val ranked = und
      .join(deg.select(col("__id").as("__u"), col("__deg").as("__du")), "__u")
      .join(deg.select(col("__id").as("__v"), col("__deg").as("__dv")), "__v")
    val uLow = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("__u") < col("__v"))
    val o = ranked.select(
      when(uLow, col("__u")).otherwise(col("__v")).as("__a"),
      when(uLow, col("__v")).otherwise(col("__u")).as("__b"),
      when(uLow, col("__dv")).otherwise(col("__du")).as("__db"))
      .repartition(col("__a"))
      .localCheckpoint(true)

    val edgeCount = timed("edges")(o.count())
    val yLtZ = col("e1.__db") < col("e2.__db") ||
      (col("e1.__db") === col("e2.__db") && col("e1.__b") < col("e2.__b"))
    val wedges = o.as("e1").join(o.as("e2"), col("e1.__a") === col("e2.__a"))
      .filter(yLtZ)
      .select(col("e1.__a").as("__x"), col("e1.__b").as("__y"),
        col("e2.__b").as("__z"))
    timed("wedges_raw")(wedges.count())
    import spark.implicits._
    // the CLAMPED stat.bloomFilter reading is kept deliberately as the
    // regression probe for the sf10 finding (its bitmap saturates at
    // 2^26 bits — wedges_bloomed_capped ≈ wedges_raw at 120M edges);
    // wedges_bloomed_uncapped is what production (Graph.triangleCounts)
    // actually runs
    val bfCapped = timed("bloom_build_capped")(
      o.select(xxhash64(col("__a"), col("__b")).as("__h"))
        .stat.bloomFilter("__h", math.max(edgeCount, 1L), 0.01))
    val bfCappedB = spark.sparkContext.broadcast(bfCapped)
    timed("wedges_bloomed_capped")(wedges.filter(
      graft.functions.BloomMightContain.column(
        spark, xxhash64(col("__y"), col("__z")), bfCappedB)).count())
    bfCappedB.unpersist(blocking = false)
    val expectedItems = math.max(edgeCount, 1L)
    val bf = timed("bloom_build_uncapped")(
      o.select(xxhash64(col("__a"), col("__b")).as("__h")).as[Long]
        .rdd.coalesce(8)
        .mapPartitions { it =>
          val f = org.apache.spark.util.sketch.BloomFilter.create(
            expectedItems, 0.01)
          it.foreach(f.putLong)
          Iterator.single(f)
        }
        .coalesce(1, shuffle = true)
        .mapPartitions { fs =>
          Iterator.single(fs.reduce { (a, b) => a.mergeInPlace(b); a })
        }
        .collect().head)
    val bfB = spark.sparkContext.broadcast(bf)
    timed("wedges_bloomed_uncapped")(wedges.filter(
      graft.functions.BloomMightContain.column(
        spark, xxhash64(col("__y"), col("__z")), bfB)).count())
    spark.stop()
  }
}
