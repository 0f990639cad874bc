package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for selected queries (plan review).
  *
  * Session config mirrors [[graft.Bench]] (UTC timezone, AQE on, core
  * count from SPARK_GRAFT_CPUS) so the captured plans are the plans the
  * bench actually runs — a plan dumped under a different shuffle-
  * partition count or timezone can differ in Exchange placement and
  * even resolve (events queries require the UTC session).
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <name> [name...]
  * With names `@headline` expands to the whole bench slice; output goes
  * to stdout (one `===== name =====` block per query) and, when
  * SPARK_GRAFT_PLAN_DIR is set, one `<dir>/<name>.txt` file per query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names0 = if (args.length > 1) args.drop(1).toSeq
      else Seq("q6_forecast_revenue", "star_join4", "q3_shipping_priority")
    val names = names0.flatMap {
      case "@headline" => graft.Bench.headlineNames
      // every declared query, for whole-inventory plan audits (r21):
      // NB constructing some entries runs real jobs (iterative loops,
      // index builds materialize at DataFrame-construction time), so
      // @all is meant for a small sfDir
      case "@all" => graft.SparkEntry.queries.keys.toSeq.sorted
      case n => Seq(n)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    planDir.foreach(d => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d)))
    names.foreach { n =>
      println(s"===== $n =====")
      val txt = try {
        graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch {
        case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}"
      }
      println(txt)
      planDir.foreach { d =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"$n.txt"), s"===== $n =====\n" + txt)
      }
    }
    spark.stop()
  }
}
