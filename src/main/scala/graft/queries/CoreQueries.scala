package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables.t
import Num._

/** Core OLAP surface: scans, filters, projections, aggregation,
  * sort/limit, windows, set ops, grouping sets, subqueries — the
  * capability surface the reference inherits from DataFusion and
  * exercises via TPC-H (SURVEY.md §2.2; `/root/reference/tpc/src/main.rs`).
  *
  * Every query is declarative DataFrame API → Catalyst gets full freedom
  * (pushdown, pruning, join reordering, partial aggregation, AQE). At
  * 100 TB the same plans hold: groupBy keys are low-cardinality (partial
  * agg shrinks the shuffle), filters reach the parquet scan, top-k is
  * TakeOrderedAndProject (no global sort materialization).
  *
  * Output-type conventions for the DuckDB hash-compare: money aggregates
  * in exact long-cents fixed point surfaced as DOUBLE (see Num.scala);
  * dates as ISO strings; event timestamps as epoch seconds.
  */
object CoreQueries {

  private def isoDate(c: org.apache.spark.sql.Column) = date_format(c, "yyyy-MM-dd")

  /** TPC-H Q1-style pricing summary: full-scan partial+final hash agg. */
  val q1Pricing: Q = Q(
    "q1_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
      |  ${oraMoneySum("l_quantity")} AS sum_qty,
      |  ${oraMoneySum("l_extendedprice")} AS sum_base_price,
      |  $oraRevenueSum AS sum_disc_price,
      |  ${oraR4(s"SUM(${oraCents("l_quantity")})/100.0 / COUNT(*)")} AS avg_qty,
      |  ${oraR4(s"SUM(${oraCents("l_extendedprice")})/100.0 / COUNT(*)")} AS avg_price,
      |  ${oraR4(s"SUM(${oraCents("l_discount")})/100.0 / COUNT(*)")} AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        avgCents(col("l_quantity"), count(lit(1))).as("avg_qty"),
        avgCents(col("l_extendedprice"), count(lit(1))).as("avg_price"),
        avgCents(col("l_discount"), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Filter + projection with LIKE / BETWEEN / IN / CASE — pushdown showcase. */
  val q2Filter: Q = Q(
    "q2_filter_project",
    """SELECT p_partkey, p_name, upper(p_brand) AS brand_uc, p_size,
      |  CASE WHEN p_size >= 30 THEN 'large' WHEN p_size >= 15 THEN 'medium' ELSE 'small' END AS size_class,
      |  p_retailprice AS retail
      |FROM part
      |WHERE p_type LIKE 'S%' AND p_size BETWEEN 5 AND 45
      |  AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .filter(col("p_type").like("S%") && col("p_size").between(5, 45) &&
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5"))
      .select(
        col("p_partkey"), col("p_name"),
        upper(col("p_brand")).as("brand_uc"), col("p_size"),
        when(col("p_size") >= 30, "large")
          .when(col("p_size") >= 15, "medium")
          .otherwise("small").as("size_class"),
        col("p_retailprice").as("retail"))
      .orderBy("p_partkey")
  }

  /** TPC-H Q3-style: 3-way join + agg + top-k (TakeOrderedAndProject). */
  val q3Shipping: Q = Q(
    "q3_shipping_priority",
    s"""SELECT l_orderkey,
      |  $oraRevenueSum AS revenue,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast(TimestampType))
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15 00:00:00").cast(TimestampType))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), isoDate(col("o_orderdate")).as("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style: correlated EXISTS → left-semi join with residual
    * inequality (the decorrelation the reference gets from DataFusion,
    * `/root/reference/src/lib.rs:345-358`). */
  val q4OrderPriority: Q = Q(
    "q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
    val l = t(s, dir, "lineitem")
    o.join(l, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5-style: 6-way snowflake join; dims are broadcast-size at any SF. */
  val q5LocalSupplier: Q = Q(
    "q5_local_supplier",
    s"""SELECT n_name,
      |  $oraRevenueSum AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
    val l = t(s, dir, "lineitem")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("c_custkey") === col("o_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6-style: single-table filter + exact fixed-point aggregate. */
  val q6Revenue: Q = Q(
    "q6_forecast_revenue",
    """SELECT SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)
      |         * CAST(ROUND(l_discount*100, 0) AS BIGINT))/10000.0 AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount"))) / 10000.0)
        .as("revenue"))
  }

  /** TPC-H Q7-style: nation-pair volume with EXTRACT(year). */
  val q7Volume: Q = Q(
    "q7_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year, SUM(volume)/10000.0 AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(extract(year FROM l_shipdate) AS INT) AS l_year,
      |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)
      |      * CAST(ROUND((1 - l_discount)*100, 0) AS BIGINT) AS volume
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |    AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
    val su = t(s, dir, "supplier")
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n1 = t(s, dir, "nation").select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    l.join(o, col("o_orderkey") === col("l_orderkey"))
      .join(su, col("s_suppkey") === col("l_suppkey"))
      .join(c, col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .select(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"),
        discPrice4(col("l_extendedprice"), col("l_discount")).as("volume"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg((sum(col("volume")) / 10000.0).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q10-style: returned-item revenue per customer, top 20. */
  val q10Returned: Q = Q(
    "q10_returned_items",
    s"""SELECT c_custkey, c_name,
      |  $oraRevenueSum AS revenue,
      |  c_acctbal AS acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val n = t(s, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("c_custkey") === col("o_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal").as("acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13-style: LEFT OUTER join + two-level aggregation. */
  val q13CustDist: Q = Q(
    "q13_customer_distribution",
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14-style: conditional aggregation (CASE inside SUM). */
  val q14Promo: Q = Q(
    "q14_promo_revenue",
    s"""SELECT ${oraR4("""100.0 * (SUM(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) * CAST(ROUND((1 - l_discount)*100, 0) AS BIGINT)
      |    ELSE 0 END)/10000.0)
      |  / (SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) * CAST(ROUND((1 - l_discount)*100, 0) AS BIGINT))/10000.0)""")} AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-10-01 00:00:00").cast(TimestampType))
    val p = t(s, dir, "part")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(r4(lit(100.0) *
        (sum(when(col("p_type").like("PROMO%"),
          discPrice4(col("l_extendedprice"), col("l_discount"))).otherwise(lit(0L))) / 10000.0) /
        (sum(discPrice4(col("l_extendedprice"), col("l_discount"))) / 10000.0))
        .as("promo_revenue"))
  }

  /** TPC-H Q15-style: top supplier by exact revenue == scalar-subquery
    * MAX (exact long equality). */
  val q15TopSupplier: Q = Q(
    "q15_top_supplier",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)
      |      * CAST(ROUND((1 - l_discount)*100, 0) AS BIGINT)) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_rev/10000.0 AS total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-04-01 00:00:00").cast(TimestampType))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(discPrice4(col("l_extendedprice"), col("l_discount"))).as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    val su = t(s, dir, "supplier")
    su.join(rev, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), (col("total_rev") / 10000.0).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16-style: COUNT(DISTINCT) per group. */
  val q16Distinct: Q = Q(
    "q16_supplier_count",
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
    val p = t(s, dir, "part").filter(col("p_brand") =!= "Brand#1" &&
      col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49))
    val l = t(s, dir, "lineitem")
    p.join(l, col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** HLL sketch next to the exact count. The raw HLL estimate is
    * engine-specific (DuckDB's register layout differs), so the output
    * carries every deterministic column — the exact distinct count, the
    * group size — plus an `err_within_bound` flag asserting the
    * estimate sits within 5x the declared 2% rsd. The oracle replays
    * the deterministic columns and expects the flag TRUE, so the whole
    * row hash-matches and a drifting sketch fails the gate instead of
    * hiding behind rows-only. At 100 TB the sketch is the only option —
    * fixed-size state, one pass, mergeable across partitions. */
  val q17Approx: Q = Q(
    "q17_approx_distinct",
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  COUNT(*) AS n, TRUE AS err_within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("__approx"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_parts"), col("n"),
        (abs(col("__approx") - col("exact_parts")).cast("double") /
          col("exact_parts") <= 0.1).as("err_within_bound"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q18-style: HAVING via IN-subquery on an aggregate (exact
    * long-cents comparison). */
  val q18LargeOrders: Q = Q(
    "q18_large_orders",
    s"""SELECT c_name, c_custkey, o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
      |  o_totalprice AS totalprice,
      |  ${oraMoneySum("l_quantity")} AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |    HAVING SUM(CAST(ROUND(l_quantity*100, 0) AS BIGINT)) > 15000)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    val bigOrders = l.groupBy("l_orderkey")
      .agg(sum(cents(col("l_quantity"))).as("q"))
      .filter(col("q") > 15000L)
      .select(col("l_orderkey").as("big_orderkey"))
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    o.join(bigOrders, col("o_orderkey") === col("big_orderkey"), "left_semi")
      .join(c, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .agg(moneySum(col("l_quantity")).as("sum_qty"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        isoDate(col("o_orderdate")).as("orderdate"),
        col("o_totalprice").as("totalprice"), col("sum_qty"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q22-style: scalar subquery threshold + NOT EXISTS anti join
    * (anti restricted to big orders so the result is non-empty).
    * The AVG threshold is compared in exact integer cents
    * (bal·n > Σcents, the repo playbook's long-cents discipline) — a raw
    * double AVG differs between engines by summation order, and one ulp
    * flips boundary customers in or out. */
  val q22Acctbal: Q = Q(
    "q22_global_sales",
    s"""SELECT c_nationkey, COUNT(*) AS numcust,
      |  ${oraMoneySum("c_acctbal")} AS totacctbal
      |FROM customer
      |WHERE ${oraCents("c_acctbal")} *
      |    (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0) >
      |    (SELECT SUM(${oraCents("c_acctbal")}) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val balAgg = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(Num.cents(col("c_acctbal"))).as("sum_cents"),
        count(lit(1)).as("n_bal"))
    val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
    c.join(broadcast(balAgg))
      .filter(Num.cents(col("c_acctbal")) * col("n_bal") > col("sum_cents"))
      .join(bigOrders, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** Window: ranking per partition (row_number with deterministic tiebreak). */
  val w1Rank: Q = Q(
    "w1_window_rank",
    """SELECT o_custkey, o_orderkey, o_totalprice AS totalprice, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |      FROM orders) ranked
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice").as("totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Window: running fixed-point sum + LAG. */
  val w2Running: Q = Q(
    "w2_window_running",
    """SELECT o_custkey, o_orderkey,
      |  SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS running_spend,
      |  LAG(o_totalprice) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(cents(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / 100.0)
          .as("running_spend"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Global sort + limit with deterministic tiebreak. */
  val s1TopOrders: Q = Q(
    "s1_sort_limit",
    """SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("totalprice"))
  }

  /** Set op: UNION (distinct). */
  val set1Union: Q = Q(
    "set1_union",
    """SELECT c_nationkey AS nk FROM customer
      |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")
  }

  /** Set op: INTERSECT. */
  val set2Intersect: Q = Q(
    "set2_intersect",
    """SELECT c_custkey AS k FROM customer
      |INTERSECT SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_custkey").as("k"))
      .intersect(t(s, dir, "orders").select(col("o_custkey").as("k")))
      .orderBy("k")
  }

  /** Set op: EXCEPT against a filtered subtrahend (non-trivial result). */
  val set3Except: Q = Q(
    "set3_except",
    """SELECT c_custkey AS k FROM customer
      |EXCEPT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000.0
      |ORDER BY k""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_custkey").as("k"))
      .except(t(s, dir, "orders").filter(col("o_totalprice") > 200000.0)
        .select(col("o_custkey").as("k")))
      .orderBy("k")
  }

  /** Grouping sets: ROLLUP with exact fixed-point subtotals. */
  val g1Rollup: Q = Q(
    "g1_rollup",
    s"""SELECT CAST(extract(year FROM o_orderdate) AS INT) AS o_year, o_orderstatus,
      |  COUNT(*) AS n, ${oraMoneySum("o_totalprice")} AS total
      |FROM orders
      |GROUP BY ROLLUP(CAST(extract(year FROM o_orderdate) AS INT), o_orderstatus)
      |ORDER BY o_year NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"), col("o_totalprice"))
      .rollup("o_year", "o_orderstatus")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
      .orderBy(col("o_year").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** Grouping sets: CUBE. */
  val g2Cube: Q = Q(
    "g2_cube",
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  ${oraMoneySum("l_quantity")} AS qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Scalar subquery in a filter. The 1.05·AVG threshold compares in
    * exact integer cents (price·n·100 > 105·Σcents) so no engine's
    * double summation order decides boundary rows. */
  val sub1Scalar: Q = Q(
    "sub1_scalar_subquery",
    s"""SELECT p_partkey, p_name, p_retailprice
      |FROM part
      |WHERE ${oraCents("p_retailprice")} * (SELECT COUNT(*) FROM part) * 100 >
      |  105 * (SELECT SUM(${oraCents("p_retailprice")}) FROM part)
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    val p = t(s, dir, "part")
    val priceAgg = p.agg(sum(Num.cents(col("p_retailprice"))).as("sum_cents"),
      count(lit(1)).as("n_p"))
    p.join(broadcast(priceAgg))
      .filter(Num.cents(col("p_retailprice")) * col("n_p") * 100 >
        lit(105) * col("sum_cents"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy("p_partkey")
  }

  /** IN-subquery (semi join after decorrelation). */
  val sub2In: Q = Q(
    "sub2_in_subquery",
    """SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val machinery = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey"))
    t(s, dir, "orders")
      .join(machinery, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("totalprice"))
      .orderBy("o_orderkey")
  }

  /** String functions: length/substr/upper/replace/concat. */
  val str1Funcs: Q = Q(
    "str1_string_funcs",
    """SELECT doc_id,
      |  CAST(length(text) AS INT) AS n_len,
      |  upper(substr(text, 1, 12)) AS head_uc,
      |  replace(lang, 'en', 'english') AS lang_full,
      |  source || '/' || lang AS src_lang,
      |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_words
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).as("n_len"),
        upper(substring(col("text"), 1, 12)).as("head_uc"),
        regexp_replace(col("lang"), "en", "english").as("lang_full"),
        concat(col("source"), lit("/"), col("lang")).as("src_lang"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1).as("n_words"))
      .orderBy("doc_id")
  }

  /** Date/time functions: extract, truncation, interval arithmetic. */
  val dt1Funcs: Q = Q(
    "dt1_date_funcs",
    """SELECT o_orderkey,
      |  CAST(extract(year FROM o_orderdate) AS INT) AS yr,
      |  CAST(extract(month FROM o_orderdate) AS INT) AS mo,
      |  CAST(extract(day FROM o_orderdate) AS INT) AS dy,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od,
      |  CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
      |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        isoDate(col("o_orderdate")).as("od"),
        date_format(date_add(col("o_orderdate").cast(DateType), 30), "yyyy-MM-dd").as("due_date"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
      .orderBy("o_orderkey")
  }

  /** Events: time-bucketed aggregation. `ts` is int64 epoch-nanos on the
    * Spark side (see Tables.t) — hour buckets via exact integer division. */
  val e1Hourly: Q = Q(
    "e1_events_hourly",
    s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts, event_type,
      |  COUNT(*) AS n, ${oraMoneySum("value")} AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy((expr("ts div 3600000000000") * 3600).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
      .orderBy("hour_ts", "event_type")
  }

  /** Events: per-user profile (count, distinct types, exact total). */
  val e2UserStats: Q = Q(
    "e2_user_stats",
    s"""SELECT user_id, COUNT(*) AS n_events,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  ${oraMoneySum("value")} AS total_value,
      |  CAST(CAST(MAX(ts) AS DATE) AS VARCHAR) AS last_day
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        moneySum(col("value")).as("total_value"),
        max(col("ts")).as("max_ts"))
      .select(col("user_id"), col("n_events"), col("n_types"), col("total_value"),
        date_format(timestamp_micros(expr("max_ts div 1000")), "yyyy-MM-dd").as("last_day"))
      .orderBy("user_id")
  }

  /** The reference's flagship shape: right-deep 4-dim star join
    * (`/root/reference/benches/my_benchmark.rs:122-140`). Fact side stays
    * partitioned; dims broadcast — at 100 TB this is one shuffle-free
    * pipeline over lineitem plus a single orders/customer shuffle. */
  val star4: Q = Q(
    "star_join4",
    s"""SELECT COUNT(*) AS n_rows,
      |  $oraRevenueSum AS revenue,
      |  COUNT(DISTINCT c_nationkey) AS n_nations
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    l.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("n_rows"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        countDistinct(col("c_nationkey")).as("n_nations"))
  }

  val all: Seq[Q] = Seq(
    q1Pricing, q2Filter, q3Shipping, q4OrderPriority, q5LocalSupplier,
    q6Revenue, q7Volume, q10Returned, q13CustDist, q14Promo,
    q15TopSupplier, q16Distinct, q17Approx, q18LargeOrders, q22Acctbal,
    w1Rank, w2Running, s1TopOrders,
    set1Union, set2Intersect, set3Except, g1Rollup, g2Cube,
    sub1Scalar, sub2In, str1Funcs, dt1Funcs, e1Hourly, e2UserStats, star4)
}
