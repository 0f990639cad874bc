package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable event-analytics operators over arbitrary event tables —
  * the library surface behind the fixed demo queries (`e3_sessions`,
  * `e7_funnel`, `e8_latest_per_key`). Every formulation is a
  * fixed number of key-shuffles (no self-join chains over raw events,
  * no per-key cross products), so each scales as the number of events
  * per key, not its square.
  */
object Events {

  /** Gap-based sessionization: appends a 0-based `session_id` that
    * increments whenever the time since the key's previous event
    * exceeds `gap` (same units as `tsCol`). `tieBreak` columns make
    * the within-key order total when timestamps collide, so session
    * boundaries are deterministic. One shuffle on `keys`; the
    * streaming equivalent (state instead of a window) lives in
    * `graft.streaming`. */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gap: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(gap > 0, s"gap must be positive, got $gap")
    require(!df.columns.contains("session_id"),
      "input already has a column named 'session_id'")
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__new_s",
        when(col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new_s")).over(wRun))
      .drop("__new_s")
  }

  /** Latest row per key — the ingest "upsert view" (CDC/compaction
    * winner): each key's single most recent row by `orderCols`
    * descending (list a unique id after the timestamp to make the
    * winner deterministic under ties). One shuffle on `keys`; at scale
    * this is the pattern behind merge-on-read snapshot reads. */
  def latestPerKey(
      df: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty,
      "latestPerKey needs key and order columns")
    require(!df.columns.contains("__rn"),
      "input already has a column named '__rn'")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Ordered funnel: per key, the first time of each stage where stage
    * i must occur strictly AFTER the key's stage i−1 time (first view,
    * then the first click after it, then the first purchase after
    * that, ...). Returns one row per key that reached stage 0:
    * (keyCol, first_<stage0>, ..., first_<stageN>, converted) with
    * NULLs from the first missed stage on and `converted` = 1 iff the
    * key reached the last stage. Each stage is one filtered aggregate
    * joined to the previous frontier — stage count shuffles, never a
    * window over the raw stream. */
  def funnel(
      df: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnel needs at least two stages")
    require(stages.distinct == stages,
      s"duplicate stage names would collapse their first_<stage> columns: $stages")
    val reserved = stages.map(s => s"first_$s") :+ "__cflag"
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns $clash collide with funnel working/output columns")
    def firstCol(s: String) = s"first_$s"
    val head = df.filter(col(typeCol) === stages.head)
      .groupBy(keyCol).agg(min(col(tsCol)).as(firstCol(stages.head)))
    // inner chain: stage i's first-after-previous, per key
    val chain = stages.tail.scanLeft(head) { (prev, stage) =>
      val prevFirst = prev.columns.last
      df.filter(col(typeCol) === stage)
        .join(prev.select(col(keyCol), col(prevFirst)), keyCol)
        .filter(col(tsCol) > col(prevFirst))
        .groupBy(keyCol).agg(min(col(tsCol)).as(firstCol(stage)))
    }
    val last = chain.last.withColumn("__cflag", lit(1))
    val joined = (chain.tail.dropRight(1) :+ last)
      .foldLeft(chain.head)((acc, st) => acc.join(st, Seq(keyCol), "left"))
    joined.select(
      (col(keyCol) +: stages.map(s => col(firstCol(s)))) :+
        coalesce(col("__cflag"), lit(0)).as("converted"): _*)
  }
}
