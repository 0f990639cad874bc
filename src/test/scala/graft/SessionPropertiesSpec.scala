package graft

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStreaming

/** Property gate for [[EventsStreaming.sessionizeStreamStateful]]:
  * against pseudo-random multi-user event sets split time-ordered
  * across micro-batches, the emitted sessions must equal an
  * independent single-threaded model of the same gap semantics. A
  * far-future sentinel event in the last batch drives the watermark
  * past every real session's `last + gap`, so the event-time timeout
  * must flush ALL of them (the sentinel's own open session is the one
  * excluded row). Files are split at a per-run random time cut — the
  * session spanning that cut exercises cross-batch stitching under
  * every seed. */
class SessionPropertiesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val t0 = 1705276800000000L
  private val GapUs = 1800000000L // 30 min
  private val Sentinel = 999L

  /** Deterministic LCG so every run reproduces the same "random" data. */
  private final class Lcg(seed: Long) {
    private var s = seed
    def next(bound: Int): Int = { s = s * 6364136223846793005L + 1442695040888963407L; (((s >>> 33) % bound) + bound).toInt % bound }
  }

  /** The reference model: per user, walk events in (ts, id) order,
    * close a session when the gap exceeds GapUs. */
  private def model(evs: Seq[(Long, Long, Long)]): Set[(Long, Long, Int, Long)] =
    evs.groupBy(_._3).flatMap { case (uid, es) =>
      val sorted = es.map(e => (e._2, e._1)).sorted // (us, event_id)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Long)]()
      var start = sorted.head._1; var last = start; var n = 0
      sorted.foreach { case (us, _) =>
        if (n > 0 && us - last > GapUs) {
          out += ((uid, start, n, (last - start) / 1000000L))
          start = us; n = 0
        }
        last = us; n += 1
      }
      out += ((uid, start, n, (last - start) / 1000000L))
      out
    }.toSet

  private def writeFile(dir: Path, name: String, modSecondsAgo: Long,
      rows: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    val tmp = dir.resolve(s"tmp_$name")
    rows.toDF("event_id", "us", "user_id")
      .selectExpr("event_id", "us * 1000 AS ts", "user_id")
      .coalesce(1).write.parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    val dest = dir.resolve(name)
    Files.move(part, dest)
    Files.setLastModifiedTime(dest,
      FileTime.fromMillis(System.currentTimeMillis() - modSecondsAgo * 1000))
  }

  for (seed <- Seq(11L, 42L, 1337L))
    test(s"stateful sessionization matches the model (seed $seed)") {
      val rnd = new Lcg(seed)
      // per user: monotone timestamps with gaps straddling the 30-min
      // boundary (5..55 min steps) so sessions split unpredictably
      var id = 0L
      val evs: Seq[(Long, Long, Long)] = (1L to 6L).flatMap { uid =>
        var us = t0 + rnd.next(3600) * 1000000L
        (0 until (3 + rnd.next(12))).map { _ =>
          us += (300 + rnd.next(3000)).toLong * 1000000L // +5..55 min
          id += 1
          (id, us, uid)
        }
      }
      // time-ordered split into two batches at a random cut (ingest
      // files arrive in event-time order; per-user order stays monotone)
      val cut = t0 + (3600 + rnd.next(7200)) * 1000000L
      val batch1 = evs.filter(_._2 <= cut)
      val batch2 = evs.filter(_._2 > cut) :+
        ((id + 1, t0 + 400L * 3600 * 1000000L, Sentinel)) // watermark driver
      val dir = Files.createTempDirectory(s"graft_sess_prop_$seed")
      writeFile(dir, "a.parquet", 60, if (batch1.nonEmpty) batch1 else Seq((0L, t0, 7L)))
      writeFile(dir, "b.parquet", 1, batch2)
      val got = EventsStreaming.sessionizeStreamStateful(
        spark, dir.toString, s"sess_prop_$seed",
        watermarkDelay = "0 seconds", maxFilesPerTrigger = Some(1))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .filter(_._1 != Sentinel).toSet
      val want = model(if (batch1.nonEmpty) evs else (0L, t0, 7L) +: evs)
      assert(got == want,
        s"seed $seed mismatch:\n missing=${want -- got}\n extra=${got -- want}")
    }
}
