package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salt-and-replicate skew join — the compile-time counterpart
  * to AQE's runtime skew-join splitting (which only engages above
  * partition-size thresholds and only for sort-merge/shuffled-hash
  * plans). When one side's key distribution is known-skewed (a handful
  * of hot keys carrying most of the rows), salting spreads EACH hot
  * key over `saltFactor` shuffle partitions:
  *
  *  - the skewed (fact) side gets a deterministic per-row salt in
  *    `[0, saltFactor)` appended to its join key;
  *  - the other (dim) side is replicated `saltFactor` times, once per
  *    salt value, so every (key, salt) bucket finds its match.
  *
  * Join semantics are unchanged for inner and left-outer-of-the-
  * skewed-side joins: each fact row still meets exactly one copy of
  * each matching dim row. The shuffle, however, now carries
  * `saltFactor` distinct keys where one hot key used to serialize a
  * single reducer — the classic remedy when a 100 TB fact table has a
  * handful of keys holding >1% of all rows each.
  *
  * The salt is `pmod(xxhash64(fact cols...), saltFactor)` over the
  * fact side's OTHER columns (or a provided column), so it is
  * deterministic (replayable, retry-safe) without being correlated
  * with the join key.
  *
  * Cost model: replicating the dim side multiplies its shuffle volume
  * by `saltFactor` — use only when the dim side is much smaller than
  * the hot keys' row counts (the usual shape: big skewed fact, modest
  * dim that still exceeds the broadcast threshold).
  */
object SaltedJoin {

  /** Inner or left_outer join of a skewed `fact` against `dim` on
    * `factKey === dimKey`, salted `saltFactor` ways. `saltSource`
    * provides the per-row entropy for the fact salt — pass a STABLE
    * column (an id, not monotonically_increasing_id()), so retries and
    * replays salt identically. */
  def join(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltSource: Column,
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(joinType == "inner" || joinType == "left_outer",
      s"salting preserves semantics for inner/left_outer only, got $joinType")
    // collision-free working column: a fixed "__salt" would silently
    // overwrite (and then drop) a user column of the same name
    val saltCol = Iterator.iterate("__salt")(_ + "_")
      .find(n => !fact.columns.contains(n) && !dim.columns.contains(n)).get
    val salted = fact.withColumn(saltCol, pmod(xxhash64(saltSource), lit(saltFactor)))
    val replicated = dim.withColumn(saltCol,
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted
      .join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted(saltCol) === replicated(saltCol),
        joinType)
      .drop(saltCol)
  }
}
