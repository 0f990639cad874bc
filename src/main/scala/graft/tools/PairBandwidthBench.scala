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
  *   runMain graft.tools.PairBandwidthBench [sfDir] [threshold]
  *
  * Defaults: /tmp/graft_sf10 (200k vectors × 64 dims), threshold 0.45.
  * Per-stage shuffle-write bytes are printed sorted descending so the
  * dominant exchanges are adjudicable from the artifact.
  */
object PairBandwidthBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val threshold = if (args.length > 1) args(1).toDouble else 0.45
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage-granular shuffle accounting; attribution by stage-id
    // DIFFERENCE, never by clearing: the listener bus is async, and a
    // cleared map would lose (or misattribute to the next arm) any
    // completion event that lands late
    val stageBytes = new ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null)
          stageBytes.put(sc.stageInfo.stageId,
            (m.shuffleWriteMetrics.bytesWritten, m.shuffleWriteMetrics.recordsWritten))
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
        val b = Seq.newBuilder[(Int, Long, Long)]
        while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue._1, e.getValue._2)) }
        b.result()
      }
      val fresh = entries.filterNot(e => seen.contains(e._1))
      seen ++= fresh.map(_._1)
      val total = fresh.map(_._2).sum
      val ids = fresh.map(_._1)
      val range = if (ids.isEmpty) "-" else s"${ids.min}..${ids.max}"
      println(f"[pairbw] $label total shuffle write: ${total / 1e6}%.1f MB over ${fresh.size} stages (ids $range)")
      fresh.sortBy(-_._2).take(4).foreach { case (sid, by, rec) =>
        println(f"[pairbw]   stage $sid%5d: ${by / 1e6}%9.1f MB, $rec%11d records")
      }
      total
    }

    val emb = Tables.t(spark, dir, "embeddings")
    println(s"[pairbw] dir=$dir vectors=${emb.count()} threshold=$threshold")
    drain("warmup(count)")

    def timed[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[pairbw] $name: $s%.1f s")
      (r, s)
    }
    def runArm(name: String, exact: String, verify: String): (Long, Double, Long) = {
      spark.conf.set("spark.graft.neardup.exact", exact)
      spark.conf.set("spark.graft.neardup.verify", verify)
      val (n, t) = timed(name)(
        SimilaritySearch.cosineNearDupPairs(emb, "vec_id", "embedding", threshold).count())
      val b = drain(name)
      (n, t, b)
    }

    val (nFloat, tFloat, bFloat) = runArm("float arm", "float", "auto")
    // the int8 arm's verify fetch: legacy shuffled joins vs broadcast —
    // the ONLY difference between these two arms is the verify shape,
    // so their shuffle delta is the verify stage's cost, attributed
    // within one run
    val (nShuf, tShuf, bShuf) = runArm("int8 + shuffle-verify", "int8", "shuffle")
    val (nBc, tBc, bBc) = runArm("int8 + broadcast-verify", "int8", "broadcast")

    println(s"[pairbw] pairs: float=$nFloat int8shuf=$nShuf int8bc=$nBc")
    // bit-identity across all three arms: same (idA, idB, cos_sim) rows
    def pairsOf(exact: String, verify: String) = {
      spark.conf.set("spark.graft.neardup.exact", exact)
      spark.conf.set("spark.graft.neardup.verify", verify)
      SimilaritySearch.cosineNearDupPairs(emb, "vec_id", "embedding", threshold)
    }
    // persist each arm's pair set once — exceptAll otherwise recomputes
    // the full pairwise kernel per comparison side (up to 3× per arm)
    val fl = pairsOf("float", "auto").persist()
    val i8s = pairsOf("int8", "shuffle").persist()
    val i8b = pairsOf("int8", "broadcast").persist()
    val onlyF = fl.exceptAll(i8b).count()
    val onlyB = i8b.exceptAll(fl).count()
    val onlyS = i8s.exceptAll(i8b).count()
    val identical = onlyF == 0 && onlyB == 0 && onlyS == 0 && nFloat == nBc && nShuf == nBc
    println(s"[pairbw] exceptAll float-vs-bc=$onlyF/$onlyB shuffle-vs-bc=$onlyS " +
      (if (identical) "IDENTICAL" else "MISMATCH"))
    println(f"""[pairbw] {"vectors":${emb.count()},"threshold":$threshold,"pairs":$nFloat,""" +
      f""""float_sec":$tFloat%.1f,"int8_shufflev_sec":$tShuf%.1f,"int8_bcv_sec":$tBc%.1f,""" +
      f""""float_shuffle_mb":${bFloat / 1e6}%.1f,"int8_shufflev_mb":${bShuf / 1e6}%.1f,""" +
      f""""int8_bcv_mb":${bBc / 1e6}%.1f,"verify_stage_delta_mb":${(bShuf - bBc) / 1e6}%.1f,""" +
      f""""identical":$identical}""")
    spark.stop()
  }
}
