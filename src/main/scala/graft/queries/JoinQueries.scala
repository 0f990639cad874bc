package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables.t
import Num._

/** The reference's join-type matrix (SURVEY.md §2.1 O10–O17: inner,
  * left/right/full outer, left/right semi, left/right anti, plus
  * residual non-equi filters — `/root/reference/src/operator/
  * probe_lookup_implementation/` per-type files), expressed through Spark's native
  * join types. Right-semi/right-anti are realized by side swap exactly
  * as the reference's optimizer does.
  *
  * These run through Spark's built-in shuffled-hash/broadcast-hash
  * joins; the same queries re-run through our custom
  * ParallelHashJoinExec in the `pj_*` entries (ParallelJoinQueries). */
object JoinQueries {

  val inner: Q = Q(
    "j_inner",
    """SELECT n_nationkey, n_name, r_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    t(s, dir, "nation")
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")
  }

  val leftOuter: Q = Q(
    "j_left_outer",
    """SELECT c_custkey, o_orderkey
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |ORDER BY c_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("o_orderkey"))
      .orderBy("c_custkey", "o_orderkey")
  }

  val rightOuter: Q = Q(
    "j_right_outer",
    """SELECT p_partkey, l_orderkey, l_linenumber
      |FROM part RIGHT OUTER JOIN lineitem ON p_partkey = l_partkey
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "right_outer")
      .select(col("p_partkey"), col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Full outer; aggregated so both unmatched sides are visible. */
  val fullOuter: Q = Q(
    "j_full_outer",
    """SELECT
      |  CASE WHEN p_partkey IS NULL THEN 'lineitem_only'
      |       WHEN l_orderkey IS NULL THEN 'part_only'
      |       ELSE 'both' END AS side,
      |  COUNT(*) AS n
      |FROM part FULL OUTER JOIN lineitem ON p_partkey = l_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "full_outer")
      .select(when(col("p_partkey").isNull, "lineitem_only")
        .when(col("l_orderkey").isNull, "part_only")
        .otherwise("both").as("side"))
      .groupBy("side")
      .agg(count(lit(1)).as("n"))
      .orderBy("side")
  }

  val leftSemi: Q = Q(
    "j_left_semi",
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    t(s, dir, "supplier")
      .join(t(s, dir, "lineitem"), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** Anti over a filtered build side so the result is non-empty:
    * customers who never placed a 400k+ order. */
  val leftAnti: Q = Q(
    "j_left_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000.0),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Right semi = left semi with sides swapped (reference O16:
    * `probe_lookup_implementation/right_semi.rs`). */
  val rightSemi: Q = Q(
    "j_right_semi",
    """SELECT p_partkey, p_name FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .join(t(s, dir, "lineitem"), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"))
      .orderBy("p_partkey")
  }

  /** Right anti = left anti with sides swapped (reference O17); filtered
    * probe side (quantity ≥ 48) so unmatched parts exist. */
  val rightAnti: Q = Q(
    "j_right_anti",
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey AND l_quantity >= 48.0)
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .join(t(s, dir, "lineitem").filter(col("l_quantity") >= 48.0),
        col("l_partkey") === col("p_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy("p_partkey")
  }

  /** Cross join (small × small). */
  val cross: Q = Q(
    "j_cross",
    """SELECT r_name, s_suppkey FROM region CROSS JOIN supplier
      |ORDER BY r_name, s_suppkey""".stripMargin) { (s, dir) =>
    t(s, dir, "region")
      .crossJoin(t(s, dir, "supplier"))
      .select(col("r_name"), col("s_suppkey"))
      .orderBy("r_name", "s_suppkey")
  }

  /** Equi join + non-equi residual condition (reference residual
    * JoinFilter path, `/root/reference/src/lib.rs:636-726`):
    * consecutive-order pairs per customer. */
  val residual: Q = Q(
    "j_residual_filter",
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
    a.join(b, col("custkey") === col("b_custkey") && col("a_date") < col("b_date"))
      .select(col("custkey"), col("first_order"), col("later_order"))
      .orderBy("custkey", "first_order", "later_order")
  }

  /** Skew handling: aggregate over a deliberately skewed key (event
    * user_id) — AQE skew-join territory at scale (reference's
    * work-stealing intent, SURVEY.md O18). */
  val skewAgg: Q = Q(
    "j_skew_agg",
    """SELECT e.user_id, COUNT(*) AS n, COUNT(DISTINCT e.event_type) AS n_types
      |FROM events e JOIN events e2 ON e.user_id = e2.user_id AND e.event_id <> e2.event_id
      |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"), col("event_type"))
    val e2 = t(s, dir, "events").select(col("user_id").as("u2"), col("event_id").as("eid2"))
    e.join(e2, col("user_id") === col("u2") && col("event_id") =!= col("eid2"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("event_type")).as("n_types"))
      .orderBy("user_id")
  }

  /** Explicit salt-and-replicate skew join ([[graft.operators.SaltedJoin]]):
    * the fact side's hot keys are spread over 8 salted shuffle buckets,
    * the dim side is replicated once per salt value. The salt vanishes
    * in the final aggregate, so the oracle is the PLAIN join — the gate
    * proves salting is semantics-preserving, and the technique is the
    * compile-time remedy when a known-skewed 100 TB fact key would
    * serialize one reducer (AQE's runtime splitting being the other
    * half, `j_skew_agg`). */
  val saltedJoin: Q = Q(
    "j_salted_join",
    """SELECT s_name,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) AS cents,
      |  COUNT(*) AS n
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin) { (s, dir) =>
    graft.operators.SaltedJoin.join(
      t(s, dir, "lineitem"), t(s, dir, "supplier"),
      "l_suppkey", "s_suppkey",
      saltSource = col("l_orderkey") * 8L + col("l_linenumber"),
      saltFactor = 8)
      .groupBy("s_name")
      .agg(sum(Num.cents(col("l_extendedprice"))).as("cents"),
        count(lit(1)).as("n"))
      .orderBy("s_name")
  }

  /** [[graft.operators.SaltedJoin]] on a GENUINELY hot key:
    * `o_orderpriority` has 5 distinct values, so each key carries ~20%
    * of the fact table — unsalted, 5 of 32 reducers would do all the
    * work (the reference's exponential-skew bench shape,
    * `benches/exponential_distribution.rs`). Salting 16 ways spreads
    * each hot key over 16 buckets; the salt vanishes in the aggregate,
    * so the oracle is the plain join — the gate proves the hot-key
    * rewrite is semantics-preserving. (At sf0.01 the 5-row dim would
    * broadcast anyway; the forced-shuffle perf A/B lives in
    * `tools.SkewBench`, which drives this same operator.) */
  val saltedHeavy: Q = Q(
    "j_salted_heavy",
    """SELECT o_orderpriority,
      |  CAST(substr(o_orderpriority, 1, 1) AS INT) AS urgency,
      |  CAST(SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS cents,
      |  COUNT(*) AS n
      |FROM orders
      |JOIN (SELECT DISTINCT o_orderpriority AS pr FROM orders) d
      |  ON o_orderpriority = pr
      |GROUP BY 1, 2 ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val fact = t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
    val dim = t(s, dir, "orders")
      .select(col("o_orderpriority").as("pr")).distinct()
    graft.operators.SaltedJoin.join(
      fact, dim, "o_orderpriority", "pr",
      saltSource = col("o_orderkey"), saltFactor = 16)
      .groupBy("o_orderpriority")
      .agg(sum(Num.cents(col("o_totalprice"))).as("cents"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("urgency"),
        col("cents"), col("n"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[Q] = Seq(inner, leftOuter, rightOuter, fullOuter, leftSemi,
    leftAnti, rightSemi, rightAnti, cross, residual, skewAgg, saltedJoin,
    saltedHeavy)
}
