package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CappedLongCollectList

/** Semantics of the capped collect-list aggregate (t8's bounded-memory
  * inverted-index builder): groups at or under the cap return their
  * exact element multiset; groups over the cap return NULL — including
  * when the overflow only becomes visible at MERGE time (each partial
  * buffer under the cap, their union over it), which is the case a
  * map-side-combine shuffle actually produces. */
class CappedCollectListSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def capped(cap: Int): org.apache.spark.sql.Column =
    CappedLongCollectList.cappedCollectList(col("v"), cap)(spark)

  test("groups under the cap collect exactly; groups over it are NULL") {
    import spark.implicits._
    // key 1 → 3 values, key 2 → 5 values, cap 4
    val df = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L), (2L, 24L))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(capped(4).as("vs"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).get.asInstanceOf[scala.collection.Seq[Long]].sorted == Seq(10L, 11L, 12L))
    assert(out(2L).isEmpty, "5 values under cap 4 must eval to NULL")
  }

  test("exactly-at-cap groups are exact, not truncated or nulled") {
    import spark.implicits._
    val df = Seq.tabulate(4)(i => (1L, i.toLong)).toDF("k", "v")
    val vs = df.groupBy("k").agg(capped(4).as("vs"))
      .collect()(0).getSeq[Long](1)
    assert(vs.sorted == Seq(0L, 1L, 2L, 3L))
  }

  test("merge-time overflow nulls the group even when every partial fits") {
    import spark.implicits._
    // 64 values for one key spread over 16 input partitions: each
    // partition's partial buffer holds ≤4 ≤ cap(32)? no — use cap 10:
    // partials of ~4 each fit, the merged total (64) must overflow
    val df = spark.range(0, 64, 1, 16).select(lit(1L).as("k"), col("id").as("v"))
    val out = df.groupBy("k").agg(capped(10).as("vs")).collect()(0)
    assert(out.get(1) == null, "merged cardinality 64 > cap 10 must be NULL")
  }

  test("null inputs are skipped like collect_list; all-null group is empty array") {
    import spark.implicits._
    val df = Seq((1L, Some(7L)), (1L, None), (2L, None))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(capped(4).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(7L))
    assert(out(2L) == Seq.empty, "all-null group collects an empty array")
  }

  test("agrees with collect_list + size filter on random grouped data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(5000)((rnd.nextInt(300).toLong, rnd.nextLong()))
    val df = rows.toDF("k", "v").repartition(16)
    val cappedOut = df.groupBy("k").agg(capped(20).as("vs"))
      .filter(col("vs").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val reference = df.groupBy("k").agg(collect_list("v").as("vs"))
      .filter(size(col("vs")) <= 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    assert(cappedOut == reference)
  }

  // ---- capped collect-SET (the r21 one-shuffle coOccurrence builder) ----

  private def cappedSet(cap: Int): org.apache.spark.sql.Column =
    graft.functions.CappedLongCollectSet.cappedCollectSet(col("v"), cap)(spark)

  test("set: dedups within and across partials; over-cap DISTINCT count is NULL") {
    import spark.implicits._
    // key 1 → 5 rows but only 3 distinct (cap 3: exact, duplicates free)
    // key 2 → 4 distinct values at cap 3 → NULL
    val df = Seq((1L, 10L), (1L, 11L), (1L, 10L), (1L, 12L), (1L, 11L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L))
      .toDF("k", "v").repartition(8)
    val out = df.groupBy("k").agg(cappedSet(3).as("vs"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).get.asInstanceOf[scala.collection.Seq[Long]].sorted == Seq(10L, 11L, 12L))
    assert(out(2L).isEmpty, "4 distinct values under cap 3 must be NULL")
  }

  test("set: duplicates arriving after the buffer is full do not fake an overflow") {
    import spark.implicits._
    // exactly cap distinct values, each repeated — the repeats land on a
    // full buffer and must be recognized as members, not new values
    val df = spark.range(0, 200, 1, 8)
      .select(lit(1L).as("k"), (col("id") % 4).as("v"))
    val vs = df.groupBy("k").agg(cappedSet(4).as("vs"))
      .collect()(0).getSeq[Long](1)
    assert(vs.sorted == Seq(0L, 1L, 2L, 3L))
  }

  test("set: agrees with collect_set + size filter on random grouped data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)((rnd.nextInt(300).toLong, rnd.nextInt(40).toLong))
    val df = rows.toDF("k", "v").repartition(16)
    val cappedOut = df.groupBy("k").agg(cappedSet(12).as("vs"))
      .filter(col("vs").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val reference = df.groupBy("k").agg(collect_set("v").as("vs"))
      .filter(size(col("vs")) <= 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    assert(cappedOut == reference)
  }

}
