package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the simhash signature aggregate (r21): the former 60 per-bit
  * ±1 CASE sums vs the packed 31-slot bit-count formulation now in
  * [[graft.operators.TextDedup.simhash]]. Both are timed to a noop
  * sink over the same tokenized input in one JVM; results are
  * cross-checked for bit-identity first.
  *
  *   runMain graft.tools.SimhashAggBench [sfDir] [samples]
  */
object SimhashAggBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val samples = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Tables.t(spark, sfDir, "documents")

    // current library path (packed)
    def packed(): DataFrame =
      graft.operators.TextDedup.simhash(docs, "doc_id", "text")

    // the pre-r21 formulation, reconstructed verbatim
    def legacy(): DataFrame = {
      val B = 60
      val tok = docs
        .select(col("doc_id").as("__id"),
          explode(split(col("text"), " ")).as("__tok"))
        .filter(length(col("__tok")) > 0)
        .withColumn("__h",
          expr("conv(substring(md5(__tok), 1, 15), 16, 10)").cast("long"))
      val voteCols = (0 until B).map(i =>
        sum(when(expr(s"shiftright(__h, $i) & 1") === 1, 1).otherwise(-1))
          .as(s"__v$i"))
      val votes = tok.groupBy("__id").agg(voteCols.head, voteCols.tail: _*)
      val sig = (0 until B).map(i =>
        when(col(s"__v$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
      votes.select(col("__id").as("doc_id"), sig.as("simhash"))
    }

    // legacy with the codegen'd hash kernel but the 60 CASE sums — the
    // third arm isolates the AGGREGATE change from the (r18) hash kernel
    def legacyKernelHash(): DataFrame = {
      val B = 60
      val tok = docs
        .select(col("doc_id").as("__id"),
          explode(split(col("text"), " ")).as("__tok"))
        .filter(length(col("__tok")) > 0)
        .withColumn("__h", org.apache.spark.sql.classic.GraftSqlBridge.column(
          graft.functions.Md5Prefix60(
            org.apache.spark.sql.classic.GraftSqlBridge.expression(
              spark, col("__tok")))))
      val voteCols = (0 until B).map(i =>
        sum(when(expr(s"shiftright(__h, $i) & 1") === 1, 1).otherwise(-1))
          .as(s"__v$i"))
      val votes = tok.groupBy("__id").agg(voteCols.head, voteCols.tail: _*)
      val sig = (0 until B).map(i =>
        when(col(s"__v$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
      votes.select(col("__id").as("doc_id"), sig.as("simhash"))
    }

    // bit-identity gate before timing anything
    val mismatches = packed().as("p")
      .join(legacyKernelHash().select(col("doc_id").as("lid"),
        col("simhash").as("lsig")), col("doc_id") === col("lid"), "full")
      .filter(col("simhash") =!= col("lsig") ||
        col("doc_id").isNull || col("lid").isNull)
      .count()
    require(mismatches == 0, s"packed vs legacy simhash mismatch: $mismatches")
    println("[simhashagg] bit-identity: OK")

    def time(label: String, f: () => DataFrame): Unit = {
      f().write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to samples).map { _ =>
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[simhashagg] $label%-16s median=${BenchProtocol.median(ts)}%.3f s " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    time("packed", packed)
    time("legacy60_kernel", legacyKernelHash)
    time("legacy60_sqlmd5", legacy)
    spark.stop()
  }
}
