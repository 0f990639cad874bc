package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.plans.ParallelHashJoinApi.parallelHashJoin

/** The reference's join matrix re-run through our custom
  * ParallelHashJoinExec (SURVEY.md §2.1 O1/O10–O17) — same oracles as
  * the built-in-join variants in JoinQueries, so the DuckDB gate proves
  * the custom operator's semantics for every join type, including
  * null-never-matches and residual filters. */
object ParallelJoinQueries {

  val inner: Q = Q(
    "pj_inner",
    """SELECT n_nationkey, n_name, r_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    parallelHashJoin(t(s, dir, "nation"), t(s, dir, "region"),
      Seq("n_regionkey"), Seq("r_regionkey"), "inner")
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")
  }

  val leftOuter: Q = Q(
    "pj_left_outer",
    """SELECT c_custkey, o_orderkey
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |ORDER BY c_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    parallelHashJoin(t(s, dir, "customer"), t(s, dir, "orders"),
      Seq("c_custkey"), Seq("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("o_orderkey"))
      .orderBy("c_custkey", "o_orderkey")
  }

  val rightOuter: Q = Q(
    "pj_right_outer",
    """SELECT p_partkey, l_orderkey, l_linenumber
      |FROM part RIGHT OUTER JOIN lineitem ON p_partkey = l_partkey
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    parallelHashJoin(t(s, dir, "part"), t(s, dir, "lineitem"),
      Seq("p_partkey"), Seq("l_partkey"), "right_outer")
      .select(col("p_partkey"), col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val fullOuter: Q = Q(
    "pj_full_outer",
    """SELECT
      |  CASE WHEN p_partkey IS NULL THEN 'lineitem_only'
      |       WHEN l_orderkey IS NULL THEN 'part_only'
      |       ELSE 'both' END AS side,
      |  COUNT(*) AS n
      |FROM part FULL OUTER JOIN lineitem ON p_partkey = l_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    parallelHashJoin(t(s, dir, "part"), t(s, dir, "lineitem"),
      Seq("p_partkey"), Seq("l_partkey"), "full_outer")
      .select(when(col("p_partkey").isNull, "lineitem_only")
        .when(col("l_orderkey").isNull, "part_only")
        .otherwise("both").as("side"))
      .groupBy("side")
      .agg(count(lit(1)).as("n"))
      .orderBy("side")
  }

  val leftSemi: Q = Q(
    "pj_left_semi",
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    parallelHashJoin(t(s, dir, "supplier"), t(s, dir, "lineitem"),
      Seq("s_suppkey"), Seq("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  val leftAnti: Q = Q(
    "pj_left_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    parallelHashJoin(t(s, dir, "customer"),
      t(s, dir, "orders").filter(col("o_totalprice") > 400000.0),
      Seq("c_custkey"), Seq("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Right-semi surface: API swaps sides under the hood (reference O16). */
  val rightSemi: Q = Q(
    "pj_right_semi",
    """SELECT p_partkey, p_name FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    parallelHashJoin(t(s, dir, "lineitem"), t(s, dir, "part"),
      Seq("l_partkey"), Seq("p_partkey"), "right_semi")
      .select(col("p_partkey"), col("p_name"))
      .orderBy("p_partkey")
  }

  /** Right-anti surface (reference O17). */
  val rightAnti: Q = Q(
    "pj_right_anti",
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey AND l_quantity >= 48.0)
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    parallelHashJoin(t(s, dir, "lineitem").filter(col("l_quantity") >= 48.0),
      t(s, dir, "part"),
      Seq("l_partkey"), Seq("p_partkey"), "right_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy("p_partkey")
  }

  /** Equi keys + residual non-equi condition through the custom exec
    * (reference's JoinFilter path, `full.rs`/`lib.rs:636-726`). */
  val residual: Q = Q(
    "pj_residual_filter",
    """SELECT a.o_custkey AS custkey, a.o_orderkey AS first_order, b.o_orderkey AS later_order
      |FROM orders a JOIN orders b
      |  ON a.o_custkey = b.o_custkey AND a.o_orderdate < b.o_orderdate
      |ORDER BY custkey, first_order, later_order""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "orders").select(
      col("o_custkey").as("custkey"), col("o_orderkey").as("first_order"),
      col("o_orderdate").as("a_date"))
    val b = t(s, dir, "orders").select(
      col("o_custkey").as("b_custkey"), col("o_orderkey").as("later_order"),
      col("o_orderdate").as("b_date"))
    parallelHashJoin(a, b, Seq("custkey"), Seq("b_custkey"), "inner",
      Some(col("a_date") < col("b_date")))
      .select(col("custkey"), col("first_order"), col("later_order"))
      .orderBy("custkey", "first_order", "later_order")
  }

  /** Full outer with residual filter — the reference's hardest gate
    * (`/root/reference/src/lib.rs:636-726`). */
  val fullResidual: Q = Q(
    "pj_full_outer_filter",
    """SELECT n_nationkey, s_suppkey
      |FROM nation FULL OUTER JOIN supplier
      |  ON n_nationkey = s_nationkey AND s_acctbal > 5000.0
      |ORDER BY n_nationkey NULLS FIRST, s_suppkey NULLS FIRST""".stripMargin) { (s, dir) =>
    parallelHashJoin(t(s, dir, "nation"), t(s, dir, "supplier"),
      Seq("n_nationkey"), Seq("s_nationkey"), "full_outer",
      Some(col("s_acctbal") > 5000.0))
      .select(col("n_nationkey"), col("s_suppkey"))
      .orderBy(col("n_nationkey").asc_nulls_first, col("s_suppkey").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(inner, leftOuter, rightOuter, fullOuter, leftSemi,
    leftAnti, rightSemi, rightAnti, residual, fullResidual)
}
