package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** The temporal join operators on planted timelines where the right
  * answer is enumerable: backward as-of semantics (latest at-or-before
  * ref, ties, no-preceding-ref nulls, payload carry) and banded range
  * join equivalence with a brute-force range predicate. */
class TemporalJoinsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asofBackward: latest at-or-before ref per key, with carried payload") {
    import spark.implicits._
    val probe = Seq(
      (1L, 100L), (1L, 205L), (1L, 50L), // user 1: probes at 50/100/205
      (2L, 10L)                           // user 2: before any ref → null
    ).toDF("user", "pts")
    val ref = Seq(
      (1L, 60L, "a"), (1L, 100L, "b"), (1L, 200L, "c"), // user 1 refs
      (2L, 20L, "x")
    ).toDF("user", "rts", "tag")
    val out = TemporalJoins.asofBackward(
        probe, ref, keys = Seq("user"), probeTs = "pts", refTs = "rts",
        carry = Seq("tag"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.getString(3))))
      .toMap
    assert(out((1L, 50L)) == ((None, None)), "no ref at or before 50")
    assert(out((1L, 100L)) == ((Some(100L), Some("b"))), "tie is at-or-before")
    assert(out((1L, 205L)) == ((Some(200L), Some("c"))))
    assert(out((2L, 10L)) == ((None, None)), "other key's refs must not leak")
  }

  test("bandedRangeJoin equals the brute-force range predicate") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, (i % 5).toLong, rnd.nextInt(100000).toLong)).toDF("lid", "k", "lts")
    val right = (1 to 300).map(i =>
      ((i % 5).toLong, rnd.nextInt(100000).toLong)).toDF("k", "rts")
    val band = 7000L
    val banded = TemporalJoins.bandedRangeJoin(
        left, right, keys = Seq("k"), leftTs = "lts", rightTs = "rts", band = band)
      .groupBy("lid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && abs(col("l.lts") - col("r.rts")) <= band)
      .groupBy("lid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(banded == brute, "banded formulation must match brute force exactly")
    assert(brute.nonEmpty, "test data must actually produce pairs")
  }
}
