package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.engine.Tables

/** CLI benchmark runner mirroring the reference's TPC harness
  * (`/root/reference/tpc/src/main.rs:59-114` CLI; `:313-341` timing loop;
  * `:271-287` JSON+CSV outputs; `:386-412` optional in-memory load):
  *
  *   runMain graft.tools.TpcRunner --data-path /root/testdata/sf0.1 \
  *     [--queries q1_pricing_summary,star_join4] [--iterations 3] \
  *     [--concurrency 32] [--print-plan] [--from-memory] [--out DIR]
  *
  * Per query: every iteration timed (plan+execute, noop sink), plans
  * optionally printed; results land in `results.json` and `results.csv`.
  */
object TpcRunner {
  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map())
    val dataPath = opts.getOrElse("data-path", "/root/testdata/sf0.1")
    val iterations = opts.getOrElse("iterations", "3").toInt
    val concurrency = opts.getOrElse("concurrency", "32")
    val outDir = opts.getOrElse("out", "/tmp/graft_tpc")
    val queries = opts.get("queries")
      .map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val unknown = queries.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — see SparkEntry.queries.keys")
    val printPlan = opts.contains("print-plan")
    val fromMemory = opts.contains("from-memory")

    val spark = SparkSession.builder()
      .master(s"local[$concurrency]")
      .config("spark.sql.shuffle.partitions", concurrency)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (fromMemory) Tables.names.foreach { n =>
      Tables.t(spark, dataPath, n).cache().count() // materialize, as the reference's --from-memory
    }

    val rows = for (name <- queries; fn <- SparkEntry.queries.get(name)) yield {
      val times = (1 to iterations).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dataPath).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e6 // ms, as the reference records
      }
      if (printPlan) {
        println(s"===== $name =====")
        println(fn(spark, dataPath).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      println(f"$name%-28s min=${times.min}%10.1f ms  avg=${times.sum / times.size}%10.1f ms  runs=${times.size}")
      (name, times)
    }

    Files.createDirectories(Paths.get(outDir))
    val json = rows.map { case (n, ts) =>
      s""""$n": {"ms": [${ts.map(t => f"$t%.1f").mkString(",")}]}"""
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/results.json"), json)
    val csv = "query,iteration,ms\n" + rows.flatMap { case (n, ts) =>
      ts.zipWithIndex.map { case (t, i) => f"$n,${i + 1},$t%.1f" }
    }.mkString("\n")
    Files.writeString(Paths.get(s"$outDir/results.csv"), csv)
    println(s"results written to $outDir/results.{json,csv}")
    spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case flag :: rest if flag.startsWith("--") =>
        val key = flag.drop(2)
        rest match {
          case v :: tail if !v.startsWith("--") => parse(tail, acc + (key -> v))
          case _ => parse(rest, acc + (key -> ""))
        }
      case _ :: rest => parse(rest, acc)
    }
}
