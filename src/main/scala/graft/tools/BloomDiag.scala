package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated false-positive-rate probe of `stat.bloomFilter` at gr2's
  * scales: build over N hashed longs at fpp 0.01, probe with N disjoint
  * longs, report the measured FP rate. Diagnoses the sf10 saturation.
  *
  *   runMain graft.tools.BloomDiag [n1,n2,...]
  */
object BloomDiag {
  def main(args: Array[String]): Unit = {
    val ns = args.headOption.getOrElse("12000000,120000000")
      .split(",").map(_.trim.toLong)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- ns) {
      val members = spark.range(0, n, 1, 32)
        .select(xxhash64(col("id")).as("h"))
      val bf = members.stat.bloomFilter("h", n, 0.01)
      println(s"[bloomdiag] n=$n impl=${bf.getClass.getSimpleName} bitSize=${bf.bitSize()}")
      val bfB = spark.sparkContext.broadcast(bf)
      val mc = graft.functions.BloomMightContain.column(
        spark, xxhash64(col("id")), bfB)
      // probe ids disjoint from members: [n, 2n)
      val fp = spark.range(n, 2 * n, 1, 32).filter(mc).count()
      // sanity: every member must pass
      val tp = spark.range(0, n, 1, 32).filter(mc).count()
      println(f"[bloomdiag] n=$n fp_rate=${fp.toDouble / n}%.4f member_pass=${tp.toDouble / n}%.4f")
      bfB.unpersist(blocking = false)
    }
    spark.stop()
  }
}
