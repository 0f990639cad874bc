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
  * Timing protocol (shared statistics/gate: [[BenchProtocol]]): per
  * query one unrecorded warm-up run, then `--iterations` measured
  * samples, per-query GC seconds from the collector MXBeans, caches
  * cleared + an explicit GC between queries so the tail of a long run
  * measures the query rather than accumulated heap. All per-sample
  * times land in `results.json`/`results.csv`.
  *
  * sf1-exposure adjudication (round-9 verdict #1): on this host,
  * contention during long runs is strictly ADDITIVE — isolated samples
  * spike 5–20× while minima reproduce (results/tpc_sf1_r9), so four
  * r9 attempts never cleared a full-spread floor. The headline is
  * therefore the per-query MINIMUM (best-of-N, `total_min_ms`), and
  * the adjudicability gate is the dispersion OF THAT statistic: the
  * agreement of each query's two smallest samples
  * ([[BenchProtocol.trimmedSpread]]), with per-query escalation (up to
  * 4 extra samples) until the best pair agrees within the floor. The
  * full spread (`variance`) stays in the artifact so the pollution
  * level is itself on record; per-query failures are tolerated,
  * listed in `failed`, and fail the gate.
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
    import BenchProtocol.median
    // host-band canaries, sampled at both ends like graft.Bench (round
    // 14: the sf1 re-anchor read 1.073x vs the r10 artifact and could
    // not be normalized because this artifact class carried no canary —
    // every cross-round comparison of these minutes-long runs had to
    // fall back to the narrative "inside the host band"). A throw
    // degrades to -1, never kills the run.
    def guarded(label: String)(body: => Double): Double =
      try body catch {
        case e: Throwable =>
          System.err.println(s"[tpc] $label failed (degraded, continuing): ${e.getMessage}")
          -1.0
      }
    // canaries only on CLI runs (ownsSession): an embedded caller —
    // the specs drive main() three times against a small local[4]
    // session — would pay ~8 s per canary sample for an artifact
    // nobody reads cross-round; embedded artifacts carry -1 (degraded,
    // normalization unavailable), exactly like a canary throw
    val canaryStart =
      if (ownsSession) guarded("canary(start)")(BenchProtocol.canarySeconds(spark))
      else -1.0
    val canaryShStart =
      if (ownsSession)
        guarded("canary_shuffle(start)")(BenchProtocol.canaryShuffleSeconds(spark))
      else -1.0
    val rows = for (name <- queries; fn <- SparkEntry.queries.get(name)) yield {
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, dataPath).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e6 // ms, as the reference records
        } catch {
          case e: Throwable =>
            System.err.println(s"[tpc] $name failed: ${e.getMessage}")
            -1.0 // failures surface as a sentinel, never as a fast timing
        }
      }
      val gc0 = gcMillis()
      val warm = once() // warm-up: not recorded, builds plan-keyed caches + codegen
      val base =
        if (warm < 0.0) Seq(warm) // fail fast, skip the sample loop
        else (1 to iterations).map(_ => once())
      // Escalation targets SELF-ADJUDICATION on this bursty host
      // (contention is additive — spikes inflate individual samples, so
      // the best-of-N minimum is the reproducible statistic): keep
      // sampling until the query's two smallest samples agree within the
      // floor, up to 4 extra samples. A query whose two best samples
      // agree is adjudicable on its minimum even when its full spread is
      // spike-blown.
      var times = base
      if (times.forall(_ >= 0.0)) {
        var extra = 0
        while (times.size >= 2 && extra < 4 &&
            BenchProtocol.pairSpread(times) > BenchProtocol.VarianceFloor) {
          val t = once()
          times = times :+ t
          extra += 1
          if (t < 0.0) extra = 4 // a late failure ends the query too
        }
      }
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
      if (times.contains(-1.0))
        println(f"$name%-28s FAILED (runs=${times.size})")
      else
        println(f"$name%-28s median=${median(times)}%10.1f ms  min=${times.min}%10.1f ms  pair_spread=${BenchProtocol.pairSpread(times)}%5.3f  gc=${gcSec}%6.2f s  runs=${times.size}")
      (name, times, gcSec)
    }

    val canaryEnd =
      if (ownsSession) guarded("canary(end)")(BenchProtocol.canarySeconds(spark))
      else -1.0
    val canaryShEnd =
      if (ownsSession)
        guarded("canary_shuffle(end)")(BenchProtocol.canaryShuffleSeconds(spark))
      else -1.0
    val canary =
      if (canaryStart > 0 && canaryEnd > 0) (canaryStart + canaryEnd) / 2.0 else -1.0
    val canaryDrift =
      if (canaryStart > 0 && canaryEnd > 0) (canaryEnd - canaryStart) / canaryStart else 0.0
    val canaryShuffle =
      if (canaryShStart > 0 && canaryShEnd > 0) (canaryShStart + canaryShEnd) / 2.0 else -1.0

    Files.createDirectories(Paths.get(outDir))
    def jstr(s: String): String = "\"" + BenchProtocol.jsonEscape(s) + "\""
    val confJson = appliedConf.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ",", "}")
    val (okRows, badRows) = rows.partition { case (_, ts, _) => !ts.contains(-1.0) }
    val failed = badRows.map(r => jstr(r._1)).mkString("[", ",", "]")
    // run-level noise floors (BenchProtocol, shared with graft.Bench):
    //   - variance: mean per-query (max−min)/median — the FULL spread.
    //   - trimmed_spread: mean per-query agreement of the two smallest
    //     samples — the dispersion of the best-of-N headline statistic.
    // At sf1 exposure this host's contention is strictly additive
    // (isolated 5–20× spikes), so the run is adjudicated on the TRIMMED
    // statistic: headline = per-query minimum (`min_ms`, totalled in
    // `total_min_ms`), gate = trimmed_spread under the shared floor AND
    // no failed queries. The full spread stays in the artifact so the
    // pollution level is itself on record.
    val okSamples = okRows.map(_._2)
    val variance = BenchProtocol.meanRelSpread(okSamples)
    val trimmedSpread = BenchProtocol.trimmedSpread(okSamples)
    val adjudicable = BenchProtocol.adjudicable(badRows.nonEmpty, trimmedSpread)
    val totalMin = okRows.map(_._2.min).sum
    val totalMedian = okRows.map(r => median(r._2)).sum
    // config/variance are just elements, so an empty run set still
    // yields valid JSON (no dangling separator)
    val entries = Seq(
      s""""config": $confJson""",
      f""""canary_sec": $canary%.3f""",
      f""""canary_drift": $canaryDrift%.3f""",
      f""""canary_shuffle_sec": $canaryShuffle%.3f""",
      f""""variance": $variance%.3f""",
      f""""trimmed_spread": $trimmedSpread%.3f""",
      s""""headline_stat": "min"""",
      f""""total_min_ms": $totalMin%.1f""",
      f""""total_median_ms": $totalMedian%.1f""",
      s""""failed": $failed""",
      s""""adjudicable": $adjudicable""",
      // mechanical burst classification (round-16 verdict #2), the
      // SAME classifier graft.Bench emits: every query window with an
      // outlier is named host-burst vs jvm-internal. This runner has
      // no per-sample GC or canary_pre, so classification rides the
      // legacy query-total-GC fallback (an upper bound on what GC
      // could explain) — exactly the r15-replay code path.
      s""""suspect_kind": ${
        rows.flatMap { case (n, ts, gc) =>
          val k = BenchProtocol.suspectKind(
            ts.map(_ / 1000.0), None, Some(gc))
          if (k == "none") None else Some(s"${jstr(n)}: ${jstr(k)}")
        }.mkString("{", ",", "}")
      }""") ++ rows.map { case (n, ts, gc) =>
      s"""${jstr(n)}: {"ms": [${ts.map(t => f"$t%.1f").mkString(",")}], """ +
        f""""median_ms": ${median(ts)}%.1f, "min_ms": ${ts.min}%.1f, """ +
        f""""pair_spread": ${BenchProtocol.pairSpread(ts)}%.3f, "gc_sec": $gc%.3f}"""
    }
    Files.writeString(Paths.get(s"$outDir/results.json"),
      entries.mkString("{", ",", "}"))
    val csv = "query,iteration,ms\n" + rows.flatMap { case (n, ts, _) =>
      ts.zipWithIndex.map { case (t, i) => f"$n,${i + 1},$t%.1f" }
    }.mkString("\n")
    Files.writeString(Paths.get(s"$outDir/results.csv"), csv)
    println(s"results written to $outDir/results.{json,csv}")
    println(f"total_min=${totalMin / 1000}%.2f s  total_median=${totalMedian / 1000}%.2f s  " +
      f"variance=$variance%.3f  trimmed_spread=$trimmedSpread%.3f  adjudicable=$adjudicable")
    if (ownsSession) spark.stop()
    if (!adjudicable) {
      System.err.println(
        f"[tpc] NOT ADJUDICABLE: trimmed_spread=$trimmedSpread%.3f (floor ${BenchProtocol.VarianceFloor}), failed=$failed")
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
