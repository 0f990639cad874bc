package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.engine.Tables
import graft.operators.SimilaritySearch

/** Within-run A/B of the exact pairwise near-dup arm's implementations —
  * float-shuffled legacy kernel vs the int8-certified default — and,
  * within the int8 arm, the verify stage's two float-fetch shapes
  * (legacy shuffled joins vs the r12 broadcast fetch) — measuring the
  * thing each variant exists to cut: SHUFFLE BYTES, alongside wall
  * time, and proving all outputs bit-identical on the same corpus.
  *
  *   runMain graft.tools.PairBandwidthBench [sfDir] [threshold] [arms]
  *
  * Defaults: /tmp/graft_sf10 (200k vectors × 64 dims), threshold 0.45,
  * arms `float,int8shuffle,int8bc` (comma list, RUN IN THE GIVEN ORDER
  * — reversing it within one JVM separates a real arm cost from warm-up
  * / heap-state order effects). Per-stage shuffle-write bytes AND
  * executor task time are printed sorted by bytes so both the dominant
  * exchanges and the dominant compute stages are adjudicable from the
  * artifact. The cross-arm identity check runs over whichever arms ran.
  */
object PairBandwidthBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val threshold = if (args.length > 1) args(1).toDouble else 0.45
    val armOrder =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("float", "int8shuffle", "int8bc")
    // arm name -> (label, neardup.exact, neardup.verify, slots, blocks,
    // kernel). blocks "0" = auto (resolved from shuffle partitions); the
    // `int8hash8` arm is the round-11 shipped shape — hash placement
    // of 36 block-pair groups, the r12 balanced-slot A/B baseline
    val armDefs = Map(
      "float" -> ("float arm", "float", "auto", "balanced", "0", "auto"),
      "int8shuffle" -> ("int8 + shuffle-verify", "int8", "shuffle", "balanced", "0", "auto"),
      "int8bc" -> ("int8 + broadcast-verify", "int8", "broadcast", "balanced", "0", "auto"),
      "int8hash8" -> ("int8 + bc-verify + hash-slots B=8", "int8", "broadcast", "hash", "8", "auto"),
      // round-13 decomposition arms (round-12 advice): the r12 headline
      // A/B pitted hash-B8 against balanced-auto, conflating the
      // PLACEMENT lever with the 36→66-group GRANULARITY increase.
      // `int8hash0` isolates granularity (hash placement, auto blocks);
      // `int8bal8` isolates placement (balanced slots, B=8 groups).
      "int8hash0" -> ("int8 + bc-verify + hash-slots auto-blocks", "int8", "broadcast", "hash", "0", "auto"),
      "int8bal8" -> ("int8 + bc-verify + balanced-slots B=8", "int8", "broadcast", "balanced", "8", "auto"),
      // round-13 kernel arms: the scoring stage went compute-bound in
      // r12, so the next lever is the per-pair dot itself — Panama SIMD
      // (`vector`, bit-identical by integer associativity) vs the
      // scalar loop, everything else the shipped default shape
      "int8scalar" -> ("int8 + bc-verify + scalar dot", "int8", "broadcast", "balanced", "0", "scalar"),
      "int8simd" -> ("int8 + bc-verify + Panama SIMD dot", "int8", "broadcast", "balanced", "0", "vector"))
    val unknown = armOrder.filterNot(armDefs.contains)
    require(unknown.isEmpty, s"unknown arms: ${unknown.mkString(",")} " +
      s"(valid: ${armDefs.keys.mkString(",")})")

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage-granular shuffle + executor-time accounting; attribution by
    // stage-id DIFFERENCE, never by clearing: the listener bus is async,
    // and a cleared map would lose (or misattribute to the next arm) any
    // completion event that lands late
    final case class St(bytes: Long, records: Long, execMs: Long, tasks: Int)
    val stageBytes = new ConcurrentHashMap[Int, St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null)
          stageBytes.put(sc.stageInfo.stageId,
            St(m.shuffleWriteMetrics.bytesWritten,
              m.shuffleWriteMetrics.recordsWritten,
              m.executorRunTime, sc.stageInfo.numTasks))
      }
    })
    var seen = Set.empty[Int]
    def drain(label: String): Long = {
      // settle the async bus by POLLING for a quiet interval, not one
      // fixed sleep (round-11 advice: on a loaded host an event landing
      // after a fixed sleep is silently attributed to the NEXT arm):
      // done when no new stage id has appeared for 3 consecutive 500 ms
      // polls, bounded at 30 s
      var quiet = 0
      var lastCount = -1
      var waited = 0
      while (quiet < 3 && waited < 60) {
        Thread.sleep(500)
        waited += 1
        val c = stageBytes.size()
        if (c == lastCount) quiet += 1 else { quiet = 0; lastCount = c }
      }
      val entries = {
        val it = stageBytes.entrySet().iterator()
        val b = Seq.newBuilder[(Int, St)]
        while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
        b.result()
      }
      val fresh = entries.filterNot(e => seen.contains(e._1))
      seen ++= fresh.map(_._1)
      val total = fresh.map(_._2.bytes).sum
      val execTot = fresh.map(_._2.execMs).sum
      val ids = fresh.map(_._1)
      val range = if (ids.isEmpty) "-" else s"${ids.min}..${ids.max}"
      println(f"[pairbw] $label total shuffle write: ${total / 1e6}%.1f MB, " +
        f"executor time ${execTot / 1e3}%.1f s over ${fresh.size} stages (ids $range)")
      fresh.sortBy(e => (-e._2.bytes, -e._2.execMs)).take(6).foreach { case (sid, st) =>
        println(f"[pairbw]   stage $sid%5d: ${st.bytes / 1e6}%9.1f MB, " +
          f"${st.records}%11d records, ${st.execMs / 1e3}%8.1f s exec, ${st.tasks}%4d tasks")
      }
      total
    }

    val emb = Tables.t(spark, dir, "embeddings")
    println(s"[pairbw] dir=$dir vectors=${emb.count()} threshold=$threshold " +
      s"arms=${armOrder.mkString(",")}")
    drain("warmup(count)")

    def timed[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[pairbw] $name: $s%.1f s")
      (r, s)
    }
    def runArm(arm: String): (Long, Double, Long) = {
      val (name, exact, verify, slots, blocks, kernel) = armDefs(arm)
      spark.conf.set("spark.graft.neardup.exact", exact)
      spark.conf.set("spark.graft.neardup.verify", verify)
      spark.conf.set("spark.graft.neardup.slots", slots)
      spark.conf.set("spark.graft.neardup.blocks", blocks)
      spark.conf.set("spark.graft.neardup.kernel", kernel)
      val (n, t) = timed(name)(
        SimilaritySearch.cosineNearDupPairs(emb, "vec_id", "embedding", threshold).count())
      val b = drain(name)
      (n, t, b)
    }

    val results = armOrder.map(a => a -> runArm(a)).toMap

    println(s"[pairbw] pairs: " +
      armOrder.map(a => s"$a=${results(a)._1}").mkString(" "))
    // bit-identity across the arms that ran: same (idA, idB, cos_sim) rows
    def pairsOf(arm: String) = {
      val (_, exact, verify, slots, blocks, kernel) = armDefs(arm)
      spark.conf.set("spark.graft.neardup.exact", exact)
      spark.conf.set("spark.graft.neardup.verify", verify)
      spark.conf.set("spark.graft.neardup.slots", slots)
      spark.conf.set("spark.graft.neardup.blocks", blocks)
      spark.conf.set("spark.graft.neardup.kernel", kernel)
      SimilaritySearch.cosineNearDupPairs(emb, "vec_id", "embedding", threshold)
    }
    // persist each arm's pair set once — exceptAll otherwise recomputes
    // the full pairwise kernel per comparison side (up to 3× per arm)
    val sets = armOrder.map(a => a -> pairsOf(a).persist()).toMap
    val ref = armOrder.head
    val diffs = armOrder.tail.map { a =>
      val d1 = sets(ref).exceptAll(sets(a)).count()
      val d2 = sets(a).exceptAll(sets(ref)).count()
      (a, d1, d2)
    }
    val counts = armOrder.map(a => results(a)._1)
    val identical = diffs.forall(d => d._2 == 0 && d._3 == 0) &&
      counts.forall(_ == counts.head)
    println(s"[pairbw] exceptAll vs $ref: " +
      diffs.map { case (a, d1, d2) => s"$a=$d1/$d2" }.mkString(" ") +
      (if (identical) " IDENTICAL" else " MISMATCH"))
    def g(a: String, f: ((Long, Double, Long)) => String): String =
      results.get(a).map(f).getOrElse("null")
    println(s"""[pairbw] {"vectors":${emb.count()},"threshold":$threshold,""" +
      s""""arm_order":"${armOrder.mkString(",")}","pairs":${counts.head},""" +
      s""""float_sec":${g("float", r => f"${r._2}%.1f")},""" +
      s""""int8_shufflev_sec":${g("int8shuffle", r => f"${r._2}%.1f")},""" +
      s""""int8_bcv_sec":${g("int8bc", r => f"${r._2}%.1f")},""" +
      s""""float_shuffle_mb":${g("float", r => f"${r._3 / 1e6}%.1f")},""" +
      s""""int8_shufflev_mb":${g("int8shuffle", r => f"${r._3 / 1e6}%.1f")},""" +
      s""""int8_bcv_mb":${g("int8bc", r => f"${r._3 / 1e6}%.1f")},""" +
      s""""identical":$identical}""")
    spark.stop()
  }
}
