package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the library surface behind
  * the fixed demo queries (`t9_train_test_split`,
  * `t15_stratified_sample`): every keep/split decision derives from a
  * hash of the ROW'S CONTENT, never from a random number generator or
  * row position. That is the property a training pipeline needs so
  * splits and samples never leak or drift when data is re-ingested,
  * re-partitioned, or re-run — the same document lands on the same
  * side of every decision on every machine, forever.
  *
  * All pure column expressions (codegen'd, one scan, pushdown-
  * friendly): sampling at 100 TB is a per-row filter, not a shuffle.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of `content` — the
    * unit of every rate decision here. Same content → same bucket,
    * any engine, any run. */
  def contentBucket(content: Column, buckets: Int = 100): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    pmod(TextDedup.mdHash(content), lit(buckets.toLong))
  }

  /** Deterministic train/test split label: 'train' for rows whose
    * first md5 nibble is below `trainSixteenths` (default 12 → a
    * 75/25 split). Content-keyed for the same reasons as
    * [[contentBucket]]. */
  def contentSplit(content: Column, trainSixteenths: Int = 12): Column = {
    require(trainSixteenths >= 0 && trainSixteenths <= 16,
      s"trainSixteenths must be in [0,16], got $trainSixteenths")
    when(conv(substring(md5(content), 1, 1), 16, 10).cast("int") < trainSixteenths,
      "train").otherwise("test")
  }

  /** Keep predicate at a per-row rate: true for rows whose content
    * bucket falls below `ratePercent` (a column, so the rate can vary
    * by stratum — language, source, quality band). `filter` with this
    * to stratified-downsample in one scan. */
  def stratifiedKeep(
      content: Column,
      ratePercent: Column,
      buckets: Int = 100): Column =
    contentBucket(content, buckets) < ratePercent
}
