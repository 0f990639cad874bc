package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-split profile of gr2 (triangle counting over the co-purchase
  * graph) — the round-9 verdict ask: gr2 is the heaviest op overall
  * (solo 32.9 s median at sf0.1) and sits off-headline, so it escapes
  * the bench gate. Where does the time go?
  *
  *   runMain graft.tools.TriangleProfile [sfDir] [samples]
  *
  * Phases (each timed to a noop sink, median of `samples`; the early
  * phases re-derive the operator's internal stages — diagnostic only,
  * `full_gr2` runs the REAL headline query):
  *   edge_build   coOccurrence pairs (shared with gr1's profile)
  *   orient       + degree join + low-rank→high-rank orientation
  *   wedges       + wedge self-join at the lowest-ranked corner
  *   full_gr2     the whole headline query (edges + orient + wedges +
  *                close + per-corner credit + top100)
  * `close_credit` is reported as full_gr2 − wedges: the marginal cost
  * of the closing join + corner aggregation + final left join.
  */
object TriangleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val samples = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copurchase() = graft.queries.GraphQueries.copurchase(spark, sfDir)

    // re-derivation of triangleCounts' internal stages (Graph.scala) —
    // kept structurally identical so the phase split reflects the real
    // operator; full_gr2 below runs the actual query
    def und() = copurchase()
      .select(least(col("src"), col("dst")).as("__u"),
        greatest(col("src"), col("dst")).as("__v"))
      .filter(col("__u") =!= col("__v"))
      .distinct()
    def oriented(): DataFrame = {
      val u = und()
      val deg = u.select(col("__u").as("__id"))
        .union(u.select(col("__v").as("__id")))
        .groupBy("__id").agg(count(lit(1)).as("__deg"))
      val ranked = u
        .join(deg.select(col("__id").as("__u"), col("__deg").as("__du")), "__u")
        .join(deg.select(col("__id").as("__v"), col("__deg").as("__dv")), "__v")
      val uLow = col("__du") < col("__dv") ||
        (col("__du") === col("__dv") && col("__u") < col("__v"))
      ranked.select(
        when(uLow, col("__u")).otherwise(col("__v")).as("__a"),
        when(uLow, col("__v")).otherwise(col("__u")).as("__b"),
        when(uLow, col("__dv")).otherwise(col("__du")).as("__db"))
    }
    def wedges(): DataFrame = {
      val o = oriented()
      val yLtZ = col("e1.__db") < col("e2.__db") ||
        (col("e1.__db") === col("e2.__db") && col("e1.__b") < col("e2.__b"))
      o.as("e1").join(o.as("e2"), col("e1.__a") === col("e2.__a"))
        .filter(yLtZ)
        .select(col("e1.__a").as("__x"), col("e1.__b").as("__y"),
          col("e2.__b").as("__z"))
    }

    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def time(label: String)(mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val ts = Seq.fill(samples)(once())
      spark.catalog.clearCache(); System.gc()
      val m = median(ts)
      println(f"$label%-12s median=$m%7.3f s  samples=${ts.map(x => f"$x%.3f").mkString("[", ",", "]")}")
      m
    }

    val eb = time("edge_build")(() => copurchase())
    val or = time("orient")(() => oriented())
    val we = time("wedges")(() => wedges())
    val full = time("full_gr2")(() =>
      graft.queries.GraphQueries.triangles1.fn(spark, sfDir))
    println(f"close_credit derived=${full - we}%7.3f s  (full_gr2 - wedges)")
    println(f"""{"edge_build":$eb%.3f,"orient":$or%.3f,"wedges":$we%.3f,"full_gr2":$full%.3f,"close_credit":${full - we}%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
