package graft

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStreaming

/** Checkpoint-recovery proof for the production stateful sessionizer:
  * process batch 1, STOP the query, restart against the SAME durable
  * checkpoint dir, process batch 2 — the open session carried in
  * GroupState must survive the restart (cross-boundary session emitted
  * ONCE, stitched), and nothing emitted before the stop may be emitted
  * again (exactly-once through the file sink's manifest + the state
  * store's per-batch checkpoint). This converts the "production
  * stateful" claim of `sessionizeStreamStateful` from scaladoc to test. */
class StreamRecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val t0 = 1705276800000000L // 2024-01-15T00:00:00Z epoch-µs
  private val Min = 60000000L

  /** One parquet file, pinned name + modification time (the file source
    * processes files oldest-first, so modtime pins micro-batch order). */
  private def writeFile(dir: Path, name: String, modSecondsAgo: Long,
      rows: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    val tmp = dir.resolve(s"tmp_$name")
    rows.toDF("event_id", "us", "user_id")
      .selectExpr("event_id", "us * 1000 AS ts", "user_id")
      .coalesce(1).write.parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, dir.resolve(name))
    Files.setLastModifiedTime(dir.resolve(name),
      FileTime.fromMillis(System.currentTimeMillis() - modSecondsAgo * 1000))
  }

  /** Start the sessionizer over `srcDir` into a parquet sink at `outDir`
    * with the durable checkpoint at `ckDir`, drain all available files,
    * stop. Each call is one "process lifetime". */
  private def runOnce(srcDir: Path, outDir: Path, ckDir: Path): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = graft.engine.Tables.normalizeEventTs(
      spark.readStream
        .schema(spark.read.parquet(srcDir.toString).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString))
    val q = EventsStreaming.statefulSessions(src, watermarkDelay = "0 seconds")
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckDir.toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  private def sessions(outDir: Path): Set[(Long, Long, Int, Long)] =
    spark.read.parquet(outDir.toString).collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("session_start_us")),
        r.getInt(r.fieldIndex("n_events")),
        r.getLong(r.fieldIndex("duration_s")))).toSet

  test("kill + restart against the same checkpoint resumes exactly-once and stitches the open session") {
    val srcDir = Files.createTempDirectory("graft_recovery_src")
    val outDir = Files.createTempDirectory("graft_recovery_out")
    val ckDir = Files.createTempDirectory("graft_recovery_ck")
    Files.delete(outDir); Files.delete(ckDir) // sink/checkpoint want to create them

    // lifetime 1, two micro-batches:
    //   a1: user 3's lone event; user 1 OPENS a session (t0, t0+10')
    //   a2: user 50's event at t0+35' drives the watermark to 35' →
    //       user 3's timeout (t0+30') fires and their session is
    //       EMITTED IN LIFETIME 1; user 1's timeout (t0+40') does not —
    //       their open session rides the checkpoint across the restart
    writeFile(srcDir, "a1.parquet", 120, Seq(
      (1L, t0, 1L), (2L, t0 + 10 * Min, 1L), (3L, t0, 3L)))
    writeFile(srcDir, "a2.parquet", 60, Seq((4L, t0 + 35 * Min, 50L)))
    runOnce(srcDir, outDir, ckDir)
    assert(sessions(outDir) == Set((3L, t0, 1, 0L)),
      s"lifetime 1 must emit exactly user 3's closed session, got ${sessions(outDir)}")

    // lifetime 2 (RESTART against the same checkpoint): user 1 continues
    // the same session at t0+38' (28' gap < 30' — stitches onto the
    // recovered GroupState); user 99's sentinel drives the watermark far
    // forward, flushing user 1's and user 50's now-decided sessions
    writeFile(srcDir, "b.parquet", 1, Seq(
      (5L, t0 + 38 * Min, 1L), (6L, t0 + 360 * Min, 99L)))
    runOnce(srcDir, outDir, ckDir)

    val expected = Set(
      (3L, t0, 1, 0L),                 // from lifetime 1 — ONCE, not re-emitted
      (1L, t0, 3, 2280L),              // stitched ACROSS the restart: 3 events, 38 min
      (50L, t0 + 35 * Min, 1, 0L))     // decided by the sentinel watermark
    // user 99 stays open (watermark never passed its last+gap)
    assert(sessions(outDir) == expected, s"got ${sessions(outDir)}")
  }
}
