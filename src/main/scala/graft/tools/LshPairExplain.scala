package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the minhash-LSH candidate-stage plans for t6/t19
  * (TextQueries.lshPairs) in BOTH formulations — the r22 one-shuffle
  * capped-collect expansion (`spark.graft.lsh.expand=true`, default)
  * and the classic bucket self-join (`expand=false`) — plus the t21
  * simhashPairs candidate interior, which the `Checkpoints.cut`
  * boundary hides from ExplainDump. Each frame is executed to a noop
  * sink first so the dump is the FINAL adaptive plan.
  *
  *   runMain graft.tools.LshPairExplain [sfDir]
  */
object LshPairExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dump(title: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $title =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    // AT-SCALE shape for both formulations: the expansion only engages
    // past the shared broadcast cap (the size gate in lshPairs), and
    // the join arm only shows its true at-scale cost with the planner's
    // auto-broadcast off (the tests' standing at-scale pin) — otherwise
    // a small dump corpus broadcasts the bucket join away
    spark.conf.set("spark.graft.graph.broadcastMaxRows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    dump("t6 lshPairs (EXPANSION — at-scale shape: broadcastMaxRows=0, autoBroadcast off)",
      graft.queries.TextQueries.lshPairs(spark, sfDir))
    spark.catalog.clearCache()
    spark.conf.set("spark.graft.lsh.expand", "false")
    dump("t6 lshPairs (SELF-JOIN — at-scale shape: expand=false, autoBroadcast off)",
      graft.queries.TextQueries.lshPairs(spark, sfDir))
    spark.conf.unset("spark.graft.lsh.expand")
    spark.conf.unset("spark.graft.graph.broadcastMaxRows")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.catalog.clearCache()
    dump("t6 lshPairs (SELF-JOIN — local default, under the cap)",
      graft.queries.TextQueries.lshPairs(spark, sfDir))
    spark.catalog.clearCache()

    val docs = graft.engine.Tables.t(spark, sfDir, "documents")
    val (sig, t21) = graft.operators.TextDedup
      .simhashPairsInterior(docs, "doc_id", "text", maxHamming = 3)
    dump("t21 simhashPairs candidate interior (bucket self-join, kept — see keyspace note)", t21)
    sig.unpersist(blocking = false)
    spark.stop()
  }
}
