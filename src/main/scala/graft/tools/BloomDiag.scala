package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated false-positive-rate probe of the triangle prefilter's Bloom
  * options at gr2's scales.
  *
  * Mode `stat` (the r11 diagnosis): build via `stat.bloomFilter` at fpp
  * 0.01 and measure how the clamped 8 MB bitmap saturates (1% fpp at 1M
  * items, 22% at 12M, 100% at 120M — a NO-OP filter).
  *
  * Mode `sharded` (the r12 proof): build via the operator's REAL
  * [[graft.operators.Graph.buildShardedBloom]] path — key-sharded
  * filters, executor-side merge, one driver action per ≤64 MB shard —
  * under a deliberately modest `spark.driver.maxResultSize` (256m) so a
  * run at ≥800M items demonstrates the per-action bound the monolithic
  * collect would trip: 800M items ≈ 960 MB of filter total, > 256m as
  * one object, fine as fifteen 64 MB shards. Reports per-shard bitSize,
  * measured fp rate (parity with the honest monolithic ~1%), and
  * member-pass (must be 1.0 — no false negatives across shards).
  *
  *   runMain graft.tools.BloomDiag [n1,n2,...] [stat|sharded]
  */
object BloomDiag {
  def main(args: Array[String]): Unit = {
    val ns = args.headOption.getOrElse("12000000,120000000")
      .split(",").map(_.trim.toLong)
    val mode = if (args.length > 1) args(1) else "stat"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.maxResultSize", "256m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- ns) {
      val t0 = System.nanoTime()
      val mc = mode match {
        case "stat" =>
          val members = spark.range(0, n, 1, 32)
            .select(xxhash64(col("id")).as("h"))
          val bf = members.stat.bloomFilter("h", n, 0.01)
          println(s"[bloomdiag] n=$n impl=${bf.getClass.getSimpleName} bitSize=${bf.bitSize()}")
          val bfB = spark.sparkContext.broadcast(bf)
          graft.functions.BloomMightContain.column(
            spark, xxhash64(col("id")), bfB)
        case "sharded" =>
          import spark.implicits._
          val hashes = spark.range(0, n, 1, 32)
            .select(xxhash64(col("id")).as("h")).as[Long].rdd
          val bcs = graft.operators.Graph.buildShardedBloom(
            spark, hashes, expectedItems = n)
          val sizes = bcs.map(_.value.bitSize() / 8 / 1024 / 1024)
          println(s"[bloomdiag] n=$n shards=${bcs.size} " +
            s"shard_mb=${sizes.mkString(",")} total_mb=${sizes.sum} " +
            s"maxResultSize=256m (monolithic collect would need ${sizes.sum}m in one action)")
          graft.functions.BloomMightContain.column(
            spark, xxhash64(col("id")), bcs)
        case other => throw new IllegalArgumentException(
          s"mode must be stat or sharded, got '$other'")
      }
      val buildSec = (System.nanoTime() - t0) / 1e9
      // probe ids disjoint from members: [n, 2n)
      val fp = spark.range(n, 2 * n, 1, 32).filter(mc).count()
      // sanity: every member must pass
      val tp = spark.range(0, n, 1, 32).filter(mc).count()
      println(f"[bloomdiag] n=$n mode=$mode build_sec=$buildSec%.1f " +
        f"fp_rate=${fp.toDouble / n}%.4f member_pass=${tp.toDouble / n}%.4f")
    }
    spark.stop()
  }
}
