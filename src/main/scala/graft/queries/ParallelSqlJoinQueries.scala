package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables
import graft.plans.AutoParallelJoin

/** The transparent-rewrite gate: plain SQL text (the reference's actual
  * user surface — `ctx.sql` with `UseParallelHashJoinRule` installed,
  * `/root/reference/src/parse_sql.rs:73-76` +
  * `/root/reference/src/operator/use_parallel_hash_join_rule.rs:52-73`)
  * planned through [[graft.plans.ParallelHashJoinExec]] with no explicit
  * operator call. Every query here goes through
  * [[AutoParallelJoin.parallelSql]], which fails loudly unless at least
  * one join was converted, and `SqlAutoJoinSpec` asserts the physical
  * plan contains the custom exec — mirroring the reference's end-to-end
  * plan downcasts (`/root/reference/src/lib.rs:728-753`). */
object ParallelSqlJoinQueries {

  private def sqlQ(name: String, oracle: String, sparkSql: String): Q =
    Q(name, oracle) { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      AutoParallelJoin.parallelSql(s, sparkSql)
    }

  /** Same text both engines. */
  private def sqlQ(name: String, sql: String): Q = sqlQ(name, sql, sql)

  val inner: Q = sqlQ(
    "pjsql_inner",
    """SELECT n_nationkey, n_name, r_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin)

  val leftOuter: Q = sqlQ(
    "pjsql_left_outer",
    """SELECT c_custkey, o_orderkey
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |ORDER BY c_custkey, o_orderkey""".stripMargin)

  val rightOuter: Q = sqlQ(
    "pjsql_right_outer",
    """SELECT p_partkey, l_orderkey, l_linenumber
      |FROM part RIGHT OUTER JOIN lineitem ON p_partkey = l_partkey
      |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  val fullOuter: Q = sqlQ(
    "pjsql_full_outer",
    """SELECT
      |  CASE WHEN p_partkey IS NULL THEN 'lineitem_only'
      |       WHEN l_orderkey IS NULL THEN 'part_only'
      |       ELSE 'both' END AS side,
      |  COUNT(*) AS n
      |FROM part FULL OUTER JOIN lineitem ON p_partkey = l_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** Spark's LEFT SEMI JOIN syntax; DuckDB oracle spelled as EXISTS
    * (identical semantics, avoids depending on DuckDB's SEMI keyword). */
  val semi: Q = sqlQ(
    "pjsql_semi",
    oracle = """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      |ORDER BY s_suppkey""".stripMargin,
    sparkSql = """SELECT s_suppkey, s_name
      |FROM supplier LEFT SEMI JOIN lineitem ON l_suppkey = s_suppkey
      |ORDER BY s_suppkey""".stripMargin)

  val anti: Q = sqlQ(
    "pjsql_anti",
    oracle = """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin,
    sparkSql = """SELECT c_custkey, c_name
      |FROM customer LEFT ANTI JOIN
      |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0) big
      |  ON big.o_custkey = c_custkey
      |ORDER BY c_custkey""".stripMargin)

  /** Equi keys + non-equi residual through SQL text (reference's
    * JoinFilter path surfaced at the SQL layer). */
  val residual: Q = sqlQ(
    "pjsql_residual",
    """SELECT a.o_custkey AS custkey, a.o_orderkey AS first_order,
      |       b.o_orderkey AS later_order
      |FROM orders a JOIN orders b
      |  ON a.o_custkey = b.o_custkey AND a.o_orderdate < b.o_orderdate
      |ORDER BY custkey, first_order, later_order""".stripMargin)

  /** Two joins in one statement — both must convert (transformUp hits
    * every eligible Join, like the reference rule's full-plan walk). */
  val threeWay: Q = sqlQ(
    "pjsql_three_way",
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) AS cents
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)

  val all: Seq[Q] = Seq(inner, leftOuter, rightOuter, fullOuter, semi, anti,
    residual, threeWay)
}
