package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.engine.Tables
import graft.operators.SimilaritySearch

/** Within-run A/B of the exact pairwise near-dup arm's two
  * implementations — float-shuffled legacy kernel vs the int8-certified
  * default — measuring the thing the int8 path exists to cut: SHUFFLE
  * BYTES through the triangle-blocking exchange, alongside wall time,
  * and proving the outputs bit-identical on the same corpus.
  *
  *   runMain graft.tools.PairBandwidthBench [sfDir] [threshold]
  *
  * Defaults: /tmp/graft_sf10 (200k vectors × 64 dims), threshold 0.45.
  * Per-stage shuffle-write bytes are printed sorted descending so the
  * blocking exchange (the dominant stage) is adjudicable from the
  * artifact even though the int8 arm's total also includes its
  * per-candidate float-verify joins.
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

    // stage-granular shuffle accounting; cleared between arms
    val stageBytes = new ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null)
          stageBytes.put(sc.stageInfo.stageId,
            (m.shuffleWriteMetrics.bytesWritten, m.shuffleWriteMetrics.recordsWritten))
      }
    })
    // per-arm attribution by stage-id DIFFERENCE, never by clearing:
    // the listener bus is async, and a cleared map would lose (or
    // misattribute to the next arm) any completion event that lands
    // after the sum — the exact number this tool exists to adjudicate
    var seen = Set.empty[Int]
    def drain(label: String): Long = {
      Thread.sleep(5000) // settle the async bus (private[spark], unpollable)
      val entries = {
        val it = stageBytes.entrySet().iterator()
        val b = Seq.newBuilder[(Int, Long, Long)]
        while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue._1, e.getValue._2)) }
        b.result()
      }
      val fresh = entries.filterNot(e => seen.contains(e._1))
      seen ++= fresh.map(_._1)
      val total = fresh.map(_._2).sum
      println(f"[pairbw] $label total shuffle write: ${total / 1e6}%.1f MB over ${fresh.size} stages")
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

    spark.conf.set("spark.graft.neardup.exact", "float")
    val (nFloat, tFloat) = timed("float arm")(
      SimilaritySearch.cosineNearDupPairs(emb, "vec_id", "embedding", threshold).count())
    val bFloat = drain("float arm")

    spark.conf.set("spark.graft.neardup.exact", "int8")
    val (nInt8, tInt8) = timed("int8-certified arm")(
      SimilaritySearch.cosineNearDupPairs(emb, "vec_id", "embedding", threshold).count())
    val bInt8 = drain("int8-certified arm")

    println(s"[pairbw] pairs: float=$nFloat int8=$nInt8")
    // bit-identity: same (idA, idB, cos_sim) rows both directions
    spark.conf.set("spark.graft.neardup.exact", "float")
    val fl = SimilaritySearch.cosineNearDupPairs(emb, "vec_id", "embedding", threshold)
    spark.conf.set("spark.graft.neardup.exact", "int8")
    val i8 = SimilaritySearch.cosineNearDupPairs(emb, "vec_id", "embedding", threshold)
    val onlyF = fl.exceptAll(i8).count()
    val onlyI = i8.exceptAll(fl).count()
    println(s"[pairbw] exceptAll float-only=$onlyF int8-only=$onlyI " +
      (if (onlyF == 0 && onlyI == 0 && nFloat == nInt8) "IDENTICAL" else "MISMATCH"))
    println(f"""[pairbw] {"vectors":${emb.count()},"threshold":$threshold,"pairs":$nFloat,""" +
      f""""float_sec":$tFloat%.1f,"int8_sec":$tInt8%.1f,""" +
      f""""float_shuffle_mb":${bFloat / 1e6}%.1f,"int8_shuffle_mb":${bInt8 / 1e6}%.1f,""" +
      f""""identical":${onlyF == 0 && onlyI == 0 && nFloat == nInt8}}""")
    spark.stop()
  }
}
