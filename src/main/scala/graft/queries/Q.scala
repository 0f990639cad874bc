package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark-first implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Column names/aliases MUST match between the two — the driver sorts
  * columns by name before hashing. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** Per-slot persisted-DataFrame registry for queries whose lineage feeds
  * several branches (t6 signatures, t8/t14 shingles): re-invoking the
  * query unpersists the previous run's cache first, so long-lived
  * sessions (Bench best-of-2, TpcRunner xN iterations) hold at most one
  * cached lineage per slot instead of leaking blocks monotonically. */
object QueryCache {
  private val live = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def persistFresh(slot: String, df: DataFrame): DataFrame = {
    live.remove(slot).foreach(_.unpersist(blocking = false))
    live.put(slot, df.persist())
    df
  }
}
