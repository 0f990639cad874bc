package graft.tools

import org.apache.spark.sql.functions._
import graft.plans.{ParallelHashJoinApi, ParallelHashJoinExec}
import graft.queries.SyntheticQueries

/** A/B micro-benchmark for the build-finalizer join kernels (left
  * outer/semi/anti, full outer): whole-stage codegen vs the
  * interpreted path vs Spark's built-in shuffled-hash join, 4M probe
  * rows — the finalizer-type companion to [[MicroBench]]'s inner-join
  * matrix. Representative local[8] result: codegen beats the built-in
  * on left outer/semi/anti (~0.47-0.53 s vs 0.56-0.71 s) and matches
  * it on full outer while beating the interpreted path. */
object FinalizerBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = SyntheticQueries.baseTable(spark, 4096 * 1024L).cache()
    val dim = SyntheticQueries.smallTable(spark, 1).cache()
    base.count(); dim.count()
    val dimR = dim.withColumnRenamed("id", "d_id").withColumnRenamed("value", "d_value")
    def time(body: => Unit): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
      runs.min
    }
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.mode("overwrite").format("noop").save()
    for (jt <- Seq("left_outer", "left_semi", "left_anti", "full_outer")) {
      val builtin = time(noop(dimR.hint("SHUFFLE_HASH")
        .join(base, col("d_id") === col("id1"), jt)))
      val cg = time(noop(ParallelHashJoinApi.parallelHashJoin(
        dimR, base, Seq("d_id"), Seq("id1"), jt)))
      spark.conf.set(ParallelHashJoinExec.codegenEnabledKey, "false")
      val interp = time(noop(ParallelHashJoinApi.parallelHashJoin(
        dimR, base, Seq("d_id"), Seq("id1"), jt)))
      spark.conf.unset(ParallelHashJoinExec.codegenEnabledKey)
      println(f"[fb] $jt%-11s builtin=$builtin%.3f codegen=$cg%.3f interp=$interp%.3f")
    }
    spark.stop()
  }
}
