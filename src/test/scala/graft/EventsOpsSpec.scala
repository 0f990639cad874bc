package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

/** The event-analytics operators on planted timelines: session
  * boundaries at exactly the gap, deterministic latest-per-key ties,
  * and an N-stage funnel (the fixed query only exercises 3 stages)
  * with strict after-ordering and missed-stage NULLs. */
class EventsOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sessionize breaks strictly beyond the gap, per key") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), (1L, 200L, 3L),   // gaps 100 = gap → same session
      (1L, 301L, 4L),                                  // gap 101 > 100 → new session
      (2L, 0L, 5L)                                     // other key independent
    ).toDF("user", "ts", "eid")
    val out = Events.sessionize(ev, Seq("user"), "ts", gap = 100L,
        tieBreak = Seq("eid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out((1L, 0L)) == 0 && out((1L, 100L)) == 0 && out((1L, 200L)) == 0,
      "gaps equal to the threshold stay in-session")
    assert(out((1L, 301L)) == 1, "gap beyond threshold starts a new session")
    assert(out((2L, 0L)) == 0)
  }

  test("latestPerKey picks one deterministic winner under timestamp ties") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, 100L, "old"), (1L, 20L, 200L, "new"),
      (2L, 30L, 300L, "tie_lo"), (2L, 30L, 301L, "tie_hi")
    ).toDF("k", "ts", "eid", "v")
    val out = Events.latestPerKey(ev, Seq("k"), Seq("ts", "eid"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "new")
    assert(out(2L) == "tie_hi", "equal timestamps resolve by the id tiebreak")
  }

  test("funnel enforces strict ordering across four stages with NULL tails") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes a→b→c→d in order
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L), (1L, "d", 40L),
      // user 2: c fires BEFORE its b → funnel stops at b
      (2L, "a", 10L), (2L, "b", 30L), (2L, "c", 20L),
      // user 3: never does a → absent entirely (even with later stages)
      (3L, "b", 10L), (3L, "c", 20L), (3L, "d", 30L),
      // user 4: a only
      (4L, "a", 5L)
    ).toDF("user", "etype", "ts")
    val rows = Events.funnel(ev, "user", "etype", "ts", Seq("a", "b", "c", "d"))
      .collect().map(r => r.getLong(0) ->
        (Seq(1, 2, 3, 4).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])),
          r.getInt(5))).toMap
    assert(rows(1L) == ((Seq(Some(10L), Some(20L), Some(30L), Some(40L)), 1)))
    assert(rows(2L) == ((Seq(Some(10L), Some(30L), None, None), 0)),
      "stage before its predecessor must not count")
    assert(!rows.contains(3L), "keys that miss stage 0 are absent")
    assert(rows(4L) == ((Seq(Some(5L), None, None, None), 0)))
  }

  test("funnel rejects duplicate stages and colliding input columns") {
    import spark.implicits._
    val ev = Seq((1L, "a", 10L)).toDF("user", "etype", "ts")
    intercept[IllegalArgumentException] {
      Events.funnel(ev, "user", "etype", "ts", Seq("a", "b", "a"))
    }
    val clash = Seq((1L, "a", 10L, 99L)).toDF("user", "etype", "ts", "first_b")
    intercept[IllegalArgumentException] {
      Events.funnel(clash, "user", "etype", "ts", Seq("a", "b"))
    }
    val clash2 = Seq((1L, "a", 10L, 1)).toDF("user", "etype", "ts", "__cflag")
    intercept[IllegalArgumentException] {
      Events.funnel(clash2, "user", "etype", "ts", Seq("a", "b"))
    }
  }
}
