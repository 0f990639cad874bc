package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables.t
import Num._

/** Second TPC-H wave: market share, profit, disjunctive predicates,
  * correlated scalar subqueries, chained EXISTS/NOT EXISTS — the
  * remaining query shapes of the reference's TPC-H corpus
  * (`/root/reference/tpc/`), adapted to the testdata schema (no
  * partsupp/commitdate columns; profit omits supply cost, lateness is
  * shipdate vs orderdate+60d).
  */
object TpchExtraQueries {

  /** Q2-style minimum-cost supplier: the testdata has no partsupp
    * table, so supply cost is derived from lineitem as the minimum
    * observed unit price per (part, supplier) — MIN over per-row IEEE
    * divisions is order-free, so the double is bit-identical across
    * engines. The correlated `= (SELECT MIN(...))` is expressed as a
    * groupBy-min re-join on the region-eligible supply table (the
    * decorrelation Catalyst itself would apply). Suppliers are a
    * 100-row broadcast; the only shuffle is the partsupp derivation. */
  val q2MinCostSupplier: Q = Q(
    "q2_min_cost_supplier",
    """WITH partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         MIN(l_extendedprice / l_quantity) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2),
      |eligible AS (
      |  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
      |  FROM partsupp, supplier, nation, region
      |  WHERE s_suppkey = ps_suppkey AND s_nationkey = n_nationkey
      |    AND n_regionkey = r_regionkey AND r_name = 'ASIA')
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_suppkey, ps_supplycost
      |FROM eligible, part
      |WHERE p_partkey = ps_partkey AND p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
      |  AND ps_supplycost = (SELECT MIN(e2.ps_supplycost) FROM eligible e2
      |                       WHERE e2.ps_partkey = eligible.ps_partkey)
      |ORDER BY s_acctbal DESC, p_partkey, ps_suppkey LIMIT 100""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    val partsupp = l.groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val eligible = partsupp
      .join(broadcast(su), col("s_suppkey") === col("ps_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("ps_partkey"), col("ps_suppkey"), col("ps_supplycost"),
        col("s_acctbal"), col("s_name"), col("n_name"))
    val p = t(s, dir, "part")
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
    // correlated-min via a window over ONE pass of `eligible` (r21
    // optimization, guide §2.4): the former groupBy-min + equi-join
    // re-derived the whole partsupp subtree — two full lineitem scans,
    // two partial-agg exchanges, and a SortMergeJoin whose both sides
    // were the same aggregation. min().over(partitionBy(ps_partkey))
    // computes the identical per-part minimum on the single pass; rows
    // surviving `cost == min` are exactly the former join's matches
    // (minCost had one row per part). Plan: 24 Exchanges → 6, one
    // lineitem scan instead of two.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("ps_partkey")
    eligible
      .withColumn("__mc", min(col("ps_supplycost")).over(w))
      .filter(col("ps_supplycost") === col("__mc"))
      .join(broadcast(p), col("p_partkey") === col("ps_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("ps_suppkey"), col("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("ps_suppkey"))
      .limit(100)
  }

  /** Q11-style important stock: per-part value share against a global
    * scalar-subquery threshold. TPC-H's fraction is scale-dependent
    * (0.0001/SF), so a fixed fraction returns 0 rows as part count
    * grows; instead the threshold is scale-free — parts worth more
    * than 2× the mean part value. Values are scale-4 fixed-point
    * BIGINTs and the compare is an integer cross-multiplication
    * (`value*nparts > 2*total`) — exact in both engines (DuckDB's
    * HUGEINT sums included), per the repo's long-cents playbook. */
  val q11ImportantStock: Q = Q(
    "q11_important_stock",
    """WITH scoped AS (
      |  SELECT l_partkey,
      |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)
      |      * CAST(ROUND((1 - l_discount)*100, 0) AS BIGINT) AS val4
      |  FROM lineitem, supplier, nation
      |  WHERE s_suppkey = l_suppkey AND s_nationkey = n_nationkey
      |    AND n_name = 'NATION_1'),
      |per_part AS (SELECT l_partkey, SUM(val4) AS val4 FROM scoped GROUP BY l_partkey)
      |SELECT l_partkey, val4/10000.0 AS part_value
      |FROM per_part
      |WHERE val4 * (SELECT COUNT(*) FROM per_part) >
      |      2 * (SELECT SUM(val4) FROM per_part)
      |ORDER BY part_value DESC, l_partkey""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation").filter(col("n_name") === "NATION_1")
    val scoped = l
      .join(broadcast(su), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("l_partkey"),
        discPrice4(col("l_extendedprice"), col("l_discount")).as("val4"))
    val perPart = scoped.groupBy("l_partkey").agg(sum(col("val4")).as("val4"))
    val total = perPart.agg(sum(col("val4")).as("total4"), count(lit(1)).as("nparts"))
    perPart.join(broadcast(total))
      .filter(col("val4") * col("nparts") > lit(2L) * col("total4"))
      .select(col("l_partkey"), (col("val4") / 10000.0).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** Q8-style market share: one nation's share of regional volume per
    * year — exact long-cents volumes, deterministic double ratio. */
  val q8MarketShare: Q = Q(
    "q8_market_share",
    """SELECT o_year,
      |  FLOOR(((SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)/10000.0)
      |    / (SUM(volume)/10000.0))*10000 + 0.5)/10000 AS mkt_share
      |FROM (
      |  SELECT CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
      |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)
      |      * CAST(ROUND((1 - l_discount)*100, 0) AS BIGINT) AS volume,
      |    n2.n_name AS nation
      |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |    AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
      |    AND p_type = 'STANDARD'
      |) all_nations
      |GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_type") === "STANDARD")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val n1 = t(s, dir, "nation").select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
    val n2 = t(s, dir, "nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
    l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .join(broadcast(su), col("s_suppkey") === col("l_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(r), col("n1_region") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .select(year(col("o_orderdate")).as("o_year"),
        discPrice4(col("l_extendedprice"), col("l_discount")).as("volume"),
        col("nation"))
      .groupBy("o_year")
      .agg(r4(
        (sum(when(col("nation") === "NATION_3", col("volume")).otherwise(0L)) / 10000.0) /
          (sum(col("volume")) / 10000.0)).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q9-style profit by supplier nation and year (no supplycost column —
    * profit = discounted revenue; LIKE filter on part name). */
  val q9Profit: Q = Q(
    "q9_profit",
    """SELECT nation, o_year, SUM(amount)/10000.0 AS sum_profit
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
      |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)
      |      * CAST(ROUND((1 - l_discount)*100, 0) AS BIGINT) AS amount
      |  FROM part, supplier, lineitem, orders, nation
      |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |    AND p_name LIKE '%a%'
      |) profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_name").like("%a%"))
    val o = t(s, dir, "orders")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .join(broadcast(su), col("s_suppkey") === col("l_suppkey"))
      .join(o, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
        discPrice4(col("l_extendedprice"), col("l_discount")).as("amount"))
      .groupBy("nation", "o_year")
      .agg((sum(col("amount")) / 10000.0).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q12-style: conditional counts by line status (priority classes). */
  val q12Priority: Q = Q(
    "q12_priority_count",
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    o.join(l, col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** Q17-style: correlated scalar subquery — revenue from below-average
    * small-quantity orders. Quantities are integer-valued doubles, so
    * AVG is exact and order-free in both engines. */
  val q17SmallQty: Q = Q(
    "q17_small_quantity",
    """SELECT FLOOR((SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT))/100.0/7.0)*10000 + 0.5)/10000 AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
      |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#3")
    val avgQty = l.groupBy(col("l_partkey").as("avg_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_threshold"))
    l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .join(avgQty, col("l_partkey") === col("avg_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(r4(sum(cents(col("l_extendedprice"))) / 100.0 / 7.0).as("avg_yearly"))
  }

  /** Q19-style: disjunctive multi-attribute predicates across the join. */
  val q19Disjunctive: Q = Q(
    "q19_disjunctive",
    """SELECT SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)
      |         * CAST(ROUND((1 - l_discount)*100, 0) AS BIGINT))/10000.0 AS revenue
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND (
      |     (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
      |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 40)
      |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35 AND l_quantity BETWEEN 20 AND 50))""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    l.join(broadcast(p), col("p_partkey") === col("l_partkey") && (
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 30)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 25) && col("l_quantity").between(10, 40)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 35) && col("l_quantity").between(20, 50))))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
  }

  /** Q20-style: suppliers with heavy shipments of a brand (IN over an
    * aggregate-HAVING subquery, exact cents comparison). */
  val q20HeavySuppliers: Q = Q(
    "q20_heavy_suppliers",
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem, part
      |  WHERE p_partkey = l_partkey AND p_brand = 'Brand#4'
      |  GROUP BY l_suppkey
      |  HAVING SUM(CAST(ROUND(l_quantity*100, 0) AS BIGINT)) > 50000)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#4")
    val heavy = l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(cents(col("l_quantity"))).as("q"))
      .filter(col("q") > 50000L)
      .select(col("l_suppkey"))
    t(s, dir, "supplier")
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** Q21-style: chained EXISTS + NOT EXISTS — suppliers who were the
    * only late shipper on a multi-supplier finished order. */
  val q21Waiting: Q = Q(
    "q21_waiting_orders",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin) { (s, dir) =>
    val su = t(s, dir, "supplier")
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
    val l1 = t(s, dir, "lineitem").select(
      col("l_orderkey").as("l1_orderkey"), col("l_suppkey").as("l1_suppkey"),
      col("l_shipdate").as("l1_shipdate"))
    val l2 = t(s, dir, "lineitem").select(
      col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
    val l3 = t(s, dir, "lineitem").select(
      col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey"),
      col("l_shipdate").as("l3_shipdate"))
    l1.join(o, col("o_orderkey") === col("l1_orderkey") &&
        col("l1_shipdate") > date_add(col("o_orderdate").cast(DateType), 60).cast(TimestampType))
      .join(l2, col("l2_orderkey") === col("l1_orderkey") &&
        col("l2_suppkey") =!= col("l1_suppkey"), "left_semi")
      .join(l3, col("l3_orderkey") === col("l1_orderkey") &&
        col("l3_suppkey") =!= col("l1_suppkey") &&
        col("l3_shipdate") > col("l1_shipdate"), "left_anti")
      .join(broadcast(su), col("s_suppkey") === col("l1_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val all: Seq[Q] = Seq(q2MinCostSupplier, q11ImportantStock,
    q8MarketShare, q9Profit, q12Priority, q17SmallQty,
    q19Disjunctive, q20HeavySuppliers, q21Waiting)
}
