package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark SQL lacks natively, expressed in
  * formulations that survive 100 TB — the library surface behind the
  * fixed demo queries (`e5_asof_join`, `e6_range_join`).
  *
  * Neither operator ever plans a per-key cross product or nested loop:
  * the as-of join is a union + running-max window (one shuffle on the
  * key, any key cardinality, any time skew), and the range join bins
  * time at the band width so the join is pure equi on (key, bin) with
  * the exact predicate applied to matched pairs only.
  */
object TemporalJoins {

  /** Backward (at-or-before) as-of join: for every `probe` row, find
    * the latest `ref` row with the same key and `refTs` ≤ `probeTs`,
    * and attach its timestamp plus the requested `carry` columns
    * (NULL when no ref precedes the probe).
    *
    * Formulation: union both streams tagged ref/probe, then one
    * running MAX over a (key, time)-ordered window of a struct whose
    * first field is the ref timestamp — the struct's lexicographic
    * ordering makes `max` select the latest preceding ref, and its
    * other fields carry that ref's payload along for free. Ties at
    * equal timestamps order the ref first (at-or-before semantics).
    * One shuffle on `keys`; no range predicate ever reaches the
    * planner, so there is nothing to degrade to a nested loop.
    *
    * Output: all probe columns, plus `asof_ts` and the `carry`
    * columns (probe-side name collisions rejected). */
  def asofBackward(
      probe: DataFrame,
      ref: DataFrame,
      keys: Seq[String],
      probeTs: String,
      refTs: String,
      carry: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val out = "asof_ts" +: carry
    out.foreach(c => require(!probe.columns.contains(c),
      s"probe already has a column named '$c'"))
    val probeCols = probe.columns.toSeq
    // ref rows: the orderable struct (ts, carry...) the window maxes
    val refRows = ref.select(
      keys.map(col) ++ Seq(
        col(refTs).as("__ts"),
        lit(1).as("__is_ref"),
        struct((col(refTs).as("__asof_ts") +: carry.map(col)): _*).as("__ref")) ++
        probeCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val probeRows = probe.select(
      keys.map(col) ++ Seq(
        col(probeTs).as("__ts"),
        lit(0).as("__is_ref"),
        lit(null).cast(refRows.schema("__ref").dataType).as("__ref")) ++
        probeCols.filterNot(keys.contains).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_ref").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    refRows.unionByName(probeRows)
      .withColumn("__asof", max(col("__ref")).over(w))
      .filter(col("__is_ref") === 0)
      .select(probeCols.map(col) ++
        Seq(col("__asof.__asof_ts").as("asof_ts")) ++
        carry.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Banded range join: pairs of (`left`, `right`) rows sharing `keys`
    * with |leftTs − rightTs| ≤ `band`, WITHOUT a range predicate in the
    * join condition. Each right row lands in ONE time bin of width
    * `band`; each left row probes its 3 adjacent bins; the join is
    * equi on (keys, bin) and the exact |Δt| filter runs on matched
    * pairs only. Shuffle volume is 3× the left side — never a cross
    * product — and every qualifying pair appears exactly once.
    *
    * Output: all left columns plus the `carry` columns from the right
    * (collisions rejected); one output row per qualifying pair —
    * aggregate on top for counts/stats. */
  def bandedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      band: Long,
      carry: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(band > 0, s"band must be positive, got $band")
    carry.foreach(c => require(!left.columns.contains(c),
      s"left already has a column named '$c'"))
    // integral `div`, not double division: int64 nanosecond timestamps
    // exceed a double's 53-bit mantissa and would mis-bin at boundaries
    val rightSel = right.select(
      (keys.map(c => col(c).as(s"__r_$c")) :+
        col(rightTs).as("__r_ts") :+
        expr(s"$rightTs div ${band}L").as("__r_bin")) ++ carry.map(col): _*)
    val leftBinned = left.withColumn("__bin", explode(array(
      expr(s"$leftTs div ${band}L - 1"),
      expr(s"$leftTs div ${band}L"),
      expr(s"$leftTs div ${band}L + 1"))))
    val cond = keys.map(c => col(c) === col(s"__r_$c"))
      .reduce(_ && _) && col("__bin") === col("__r_bin")
    leftBinned.join(rightSel, cond)
      .filter(abs(col(leftTs) - col("__r_ts")) <= band)
      .select(left.columns.map(col).toSeq ++ carry.map(col): _*)
  }
}
