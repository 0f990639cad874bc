package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints

/** Diagnostic: re-derive ONE gr1 pageRank round (Graph.pageRank's loop
  * body, structurally identical) and print its formatted plan — the
  * checkpoint boundary hides the round plan from ExplainDump, and the
  * round is where gr1's wall time lives (r21 roundLog: 0.63–0.92 s per
  * round on a 20k-node graph). Also prints the triangleCounts
  * orientation join plan (the gr2 `orient` phase, 2.4–4.4 s in the r21
  * TriangleProfile window).
  *
  *   runMain graft.tools.GraphRoundExplain [sfDir]
  */
object GraphRoundExplain {
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

    // gr1 round body, mirroring Graph.pageRank
    val co = graft.queries.GraphQueries.copurchase(spark, sfDir)
    val e = graft.queries.GraphQueries.symmetrize(co)
      .select(col("src").as("__src"), col("dst").as("__dst"))
      .repartition(col("__src"))
      .persist()
    val deg = e.groupBy(col("__src").as("__id")).agg(count(lit(1)).as("__deg"))
    val init = Checkpoints.cut(
      deg.select(col("__id"), col("__deg"), lit(1000000000L).as("__r")),
      eager = true)
    println(s"[explain] nodes=${init.count()} edges=${e.count()}")
    // r22: mirrors the operator's round — only `shares` carries the
    // explicit hint (checkpoint output, no stats); `contrib` sits
    // behind its own shuffle, so AQE broadcast-converts the closing
    // left join from the runtime stage size (nodes=20k at sf0.1)
    val shares = broadcast(init.filter(col("__deg") > 0)
      .select(col("__id"), expr("__r div __deg").as("__share")))
    val contrib = e.join(shares, e("__src") === shares("__id"))
      .groupBy(col("__dst").as("__cid"))
      .agg(sum(col("__share")).as("__c"))
    val round = init.select(col("__id"), col("__deg"))
      .join(contrib, col("__id") === col("__cid"), "left")
      .select(col("__id"), col("__deg"),
        (lit(150000000L) + expr("(85 * coalesce(__c, 0L)) div 100")).as("__r"))
    // execute first THROUGH THE DATASET'S OWN QueryExecution (a
    // .write spawns a separate one and the printed plan stays static):
    // the AQE broadcast conversion of the closing join only shows in
    // the FINAL adaptive plan
    round.collect()
    println("===== gr1 ROUND plan =====")
    println(round.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

    // gr2 orientation, mirroring Graph.triangleCounts (edgesCanonical)
    val und = co.select(col("src").as("__u"), col("dst").as("__v")).persist()
    val deg2 = Checkpoints.cut(
      und.select(col("__u").as("__id"))
        .union(und.select(col("__v").as("__id")))
        .groupBy("__id").agg(count(lit(1)).as("__deg")),
      eager = true)
    val ranked = und
      .join(broadcast(
        deg2.select(col("__id").as("__u"), col("__deg").as("__du"))), "__u")
      .join(broadcast(
        deg2.select(col("__id").as("__v"), col("__deg").as("__dv"))), "__v")
    val uLow = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("__u") < col("__v"))
    val o = ranked.select(
      when(uLow, col("__u")).otherwise(col("__v")).as("__a"),
      when(uLow, col("__v")).otherwise(col("__u")).as("__b"),
      when(uLow, col("__dv")).otherwise(col("__du")).as("__db"))
      .repartition(col("__a"))
    println("===== gr2 ORIENT plan =====")
    println(o.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

    // gr3 PEEL round, mirroring Graph.kCore's loop body (k=80 as in the
    // declared query): keep-set aggregate + two keep joins against the
    // surviving edge checkpoint. Dumped TWICE — the default (keep arms
    // broadcast under Graph.broadcastMaxRows) and the at-scale shape
    // (cap 0: shuffle joins) — closing the r21 verdict's gr3 evidence
    // gap (#3). Executed through the dataset's own QueryExecution so
    // the final adaptive plan is what prints.
    val initK = Checkpoints.cut(
      co.select(col("src").as("__u"), col("dst").as("__v")), eager = true)
    def peelRound(bcast: Boolean): org.apache.spark.sql.DataFrame = {
      val keep = initK
        .select(col("__u").as("__id"))
        .unionAll(initK.select(col("__v").as("__id")))
        .groupBy("__id").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= 80)
        .select(col("__id"))
      def keepSide(df: org.apache.spark.sql.DataFrame) =
        if (bcast) broadcast(df) else df
      initK
        .join(keepSide(keep.select(col("__id").as("__u"))), Seq("__u"))
        .join(keepSide(keep.select(col("__id").as("__v"))), Seq("__v"))
        .select(col("__u"), col("__v"))
    }
    for ((bcast, label) <- Seq(
        (true, "default, keep arms broadcast under the cap"),
        (false, "at-scale shape, broadcastMaxRows=0"))) {
      val r = peelRound(bcast)
      r.collect()
      println(s"===== gr3 PEEL round plan ($label) =====")
      println(r.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
