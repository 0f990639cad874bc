package graft

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStreaming

/** The production-semantics gate for stateful streaming sessionization:
  * a session whose events span micro-batches must be emitted ONCE,
  * stitched (the batch-boundary demo variant would split it), and open
  * sessions must flush via the event-time timeout when the watermark
  * passes `last + gap` — while sessions the watermark hasn't decided
  * yet stay in state and are NOT emitted. */
class StatefulSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val t0 = 1705276800000000L // 2024-01-15T00:00:00Z epoch-µs
  private val Min = 60000000L

  /** Write (event_id, ts, user_id) rows as ONE parquet file with the
    * given name and modification time (the file source processes files
    * oldest-modification-first, so this pins micro-batch order). */
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

  test("sessions spanning micro-batches are stitched; timeouts flush decided sessions only") {
    val dir = Files.createTempDirectory("graft_stateful_sessions")
    // batch 1: user 1 starts a session; user 2 has a lone event
    writeFile(dir, "a.parquet", 60, Seq(
      (1L, t0, 1L), (2L, t0 + 10 * Min, 1L), (3L, t0, 2L)))
    // batch 2: user 1 CONTINUES the same session (gaps < 30 min) across
    // the batch boundary; user 2's event 2h later closes their first
    // session by gap; user 99's far-future event drives the watermark
    // past everyone else's last+gap
    writeFile(dir, "b.parquet", 1, Seq(
      (4L, t0 + 20 * Min, 1L), (5L, t0 + 25 * Min, 1L),
      (6L, t0 + 120 * Min, 2L), (7L, t0 + 360 * Min, 99L)))
    val out = EventsStreaming.sessionizeStreamStateful(
      spark, dir.toString, "stateful_sessions",
      watermarkDelay = "0 seconds", maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val expected = Set(
      // user 1: ONE stitched 4-event session, 25 min long — not split
      // (t0..t0+10) / (t0+20..t0+25) at the batch boundary
      (1L, t0, 4, 1500L),
      // user 2: first session closed by the 2h gap, second flushed by
      // the timeout once user 99's event advanced the watermark
      (2L, t0, 1, 0L),
      (2L, t0 + 120 * Min, 1, 0L))
    // user 99's own session must NOT appear: the watermark never passed
    // its last+gap, so it is still open/undecidable
    assert(out == expected, s"got $out")
  }

  test("a late within-watermark event folds into the open session without splitting it") {
    val dir = Files.createTempDirectory("graft_stateful_late")
    // batch 1: session open with events at 12:00 and 12:20
    writeFile(dir, "a.parquet", 60, Seq((1L, t0, 5L), (2L, t0 + 20 * Min, 5L)))
    // batch 2: a LATE event (12:05 — before the carried state's last of
    // 12:20, admitted because the 1 h watermark delay hasn't passed it)
    // plus an in-order event at 12:40 and the watermark-driving sentinel.
    // A naive rewind of `last` to 12:05 would make 12:40 look like a
    // 35-min gap and split the session; correct output is ONE session
    // of 4 events spanning 12:00→12:40.
    writeFile(dir, "b.parquet", 1, Seq(
      (3L, t0 + 5 * Min, 5L), (4L, t0 + 40 * Min, 5L),
      (5L, t0 + 400L * 60 * Min, 99L)))
    val out = EventsStreaming.sessionizeStreamStateful(
      spark, dir.toString, "stateful_late",
      watermarkDelay = "1 hour", maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .filter(_._1 != 99L).toSet
    assert(out == Set((5L, t0, 4, 2400L)), s"got $out")
  }
}
