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
  *     [--queries q1_pricing_summary,star_join4] [--exclude q3_...,...] \
  *     [--config graft.conf] [--iterations 3] \
  *     [--concurrency 32] [--print-plan] [--from-memory] [--out DIR]
  *
  * `--exclude` drops queries from the run set and `--config` loads
  * `key=value` lines (`#` comments skipped, malformed lines warned) —
  * the reference CLI's surface (`/root/reference/tpc/src/main.rs:160-177`
  * config file; its `--exclude` query filter). Applied config is echoed
  * into `results.json` like the reference's `results.config` map.
  *
  * Timing protocol == `graft.Bench` (the adjudicable-artifact recipe):
  * per query one unrecorded warm-up run, then `--iterations` measured
  * samples (median is the headline; +2 escalation samples if the
  * relative spread exceeds 1.0), per-query GC seconds from the
  * collector MXBeans, caches cleared + an explicit GC between queries
  * so the tail of a long run measures the query rather than
  * accumulated heap, and a run-level mean-relative-spread `variance`
  * stamp — the round-6 sf1 artifact was collected without these and a
  * contended host made it unadjudicable (q2 samples 165.8 s → 19.7 s).
  * All per-sample times land in `results.json`/`results.csv`.
  */
object TpcRunner {
  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map())
    val dataPath = opts.getOrElse("data-path", "/root/testdata/sf0.1")
    val iterations = opts.getOrElse("iterations", "3").toInt
    val concurrency = opts.getOrElse("concurrency", "32")
    val outDir = opts.getOrElse("out", "/tmp/graft_tpc")
    val exclude = opts.get("exclude").map(_.split(",").toSet).getOrElse(Set.empty[String])
    val unknownExcludes = exclude.filterNot(SparkEntry.queries.contains)
    require(unknownExcludes.isEmpty,
      s"unknown --exclude queries: ${unknownExcludes.mkString(", ")}")
    val queries = opts.get("queries")
      .map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
      .filterNot(exclude)
    val unknown = queries.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — see SparkEntry.queries.keys")
    val printPlan = opts.contains("print-plan")
    val fromMemory = opts.contains("from-memory")
    // key=value config file, reference CLI semantics: '#' comments
    // skipped, non key=value lines warned and ignored
    val fileConf: Seq[(String, String)] = opts.get("config").toSeq.flatMap { path =>
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(Paths.get(path))).asScala.toSeq
        .filterNot(l => l.trim.isEmpty || l.trim.startsWith("#"))
        .flatMap { line =>
          line.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim)
            case _ =>
              println(s"Warning! Skipping config entry $line")
              None
          }
        }
    }
    // a pre-existing session (tests, shells) is reused and must survive
    val ownsSession = SparkSession.getDefaultSession.isEmpty

    val spark = SparkSession.builder()
      .master(s"local[$concurrency]")
      .config("spark.sql.shuffle.partitions", concurrency)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val appliedConf = fileConf.flatMap { case (k, v) =>
      try { spark.conf.set(k, v); Some(k -> v) }
      catch {
        case e: Exception =>
          println(s"Warning! Could not apply config $k=$v: ${e.getMessage}")
          None
      }
    }

    if (fromMemory) Tables.names.foreach { n =>
      Tables.t(spark, dataPath, n).cache().count() // materialize, as the reference's --from-memory
    }

    def gcMillis(): Long = {
      val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      var total = 0L
      beans.forEach(b => if (b.getCollectionTime > 0) total += b.getCollectionTime)
      total
    }
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val rows = for (name <- queries; fn <- SparkEntry.queries.get(name)) yield {
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dataPath).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e6 // ms, as the reference records
      }
      val gc0 = gcMillis()
      once() // warm-up: not recorded, builds plan-keyed caches + codegen
      val base = (1 to iterations).map(_ => once())
      // escalation: a run whose in-query spread exceeds its median gets
      // two more samples so the median stands on firmer ground
      val times =
        if (iterations >= 3 && (base.max - base.min) / median(base) > 1.0)
          base ++ Seq(once(), once())
        else base
      val gcSec = (gcMillis() - gc0) / 1000.0
      if (printPlan) {
        println(s"===== $name =====")
        println(fn(spark, dataPath).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      // inter-query hygiene (see graft.Bench): drop this query's
      // persisted intermediates and let the cleaner reap dead blocks —
      // except under --from-memory, whose table caches must survive
      if (!fromMemory) spark.catalog.clearCache()
      System.gc()
      println(f"$name%-28s median=${median(times)}%10.1f ms  min=${times.min}%10.1f ms  gc=${gcSec}%6.2f s  runs=${times.size}")
      (name, times, gcSec)
    }

    Files.createDirectories(Paths.get(outDir))
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val confJson = appliedConf.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ",", "}")
    // run-level noise floor: mean relative in-query spread
    // ((max-min)/median) over all queries — a cross-run comparison must
    // clear this before any per-query delta means anything
    val rels = rows.collect { case (_, ts, _) if ts.min > 0 =>
      (ts.max - ts.min) / median(ts)
    }
    val variance = if (rels.nonEmpty) rels.sum / rels.size else 0.0
    // same adjudicability gate as graft.Bench: variance past 0.5 means
    // host contention drowned the signal and the artifact must not be
    // used as a standing comparable
    val adjudicable = variance <= 0.5
    // config/variance are just elements, so an empty run set still
    // yields valid JSON (no dangling separator)
    val entries = Seq(
      s""""config": $confJson""",
      f""""variance": $variance%.3f""",
      s""""adjudicable": $adjudicable""") ++ rows.map { case (n, ts, gc) =>
      s"""${jstr(n)}: {"ms": [${ts.map(t => f"$t%.1f").mkString(",")}], """ +
        f""""median_ms": ${median(ts)}%.1f, "gc_sec": $gc%.3f}"""
    }
    Files.writeString(Paths.get(s"$outDir/results.json"),
      entries.mkString("{", ",", "}"))
    val csv = "query,iteration,ms\n" + rows.flatMap { case (n, ts, _) =>
      ts.zipWithIndex.map { case (t, i) => f"$n,${i + 1},$t%.1f" }
    }.mkString("\n")
    Files.writeString(Paths.get(s"$outDir/results.csv"), csv)
    println(s"results written to $outDir/results.{json,csv}")
    if (ownsSession) spark.stop()
    if (!adjudicable) {
      System.err.println(
        f"[tpc] NOT ADJUDICABLE: variance=$variance%.3f exceeds the 0.5 floor")
      // only terminate a JVM we own (CLI runs); when invoked against a
      // pre-existing session (tests, shells) the warning + the
      // adjudicable:false stamp in results.json carry the signal — a
      // sys.exit here would kill the caller's whole process
      if (ownsSession) sys.exit(1)
    }
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
