package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/* coverage: see COVERAGE.md for the SURVEY §2 operator-by-operator map */
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator/capability from SURVEY.md §2;
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-match
  * correctness gate (omitted only for ops whose semantics aren't
  * ANSI-SQL-expressible — those get the weaker rows-only check). */
object SparkEntry {

  private def packs: Seq[Q] =
    CoreQueries.all ++ TpchExtraQueries.all ++ JoinQueries.all ++
      ParallelJoinQueries.all ++ ParallelSqlJoinQueries.all ++
      TextQueries.all ++ SimQueries.all ++
      MultimodalQueries.all ++ SyntheticQueries.all ++
      RelationalExtrasQueries.all ++ SessionQueries.all ++ GraphQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's right-deep 4-dim star join
    * (`/root/reference/benches/my_benchmark.rs:122-140`). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.star4.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
