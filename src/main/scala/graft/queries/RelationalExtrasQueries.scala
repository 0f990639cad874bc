package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables.t

/** Remaining relational surface: pivot, lateral explode with position,
  * limit+offset pagination, and regex field extraction from
  * semi-structured text. */
object RelationalExtrasQueries {

  /** Pivot: order counts per year × status (missing cells zeroed so the
    * conditional-aggregation oracle matches exactly). */
  val pivot1: Q = Q(
    "p1_pivot",
    """SELECT CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
      |  CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
      |  CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
      |  CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
      .groupBy("o_year")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_year")
  }

  /** Lateral explode with ordinality (posexplode ↔ unnest-with-index).
    * Both sides cap at the first 1000 tokens (the oracle's
    * generate_series bound and Spark's slice stay in lockstep). */
  val explode1: Q = Q(
    "l1_explode_pos",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
      |           FROM documents WHERE doc_id < 20)
      |SELECT doc_id, CAST(i - 1 AS INT) AS pos, ws[i] AS word
      |FROM w, generate_series(1, 1000) t(i)
      |WHERE i <= len(ws)
      |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(slice(split(col("text"), " "), 1, 1000)).as(Seq("pos", "word")))
      .orderBy("doc_id", "pos")
  }

  /** Pagination: ORDER BY + LIMIT + OFFSET with deterministic tiebreak. */
  val offset1: Q = Q(
    "s2_limit_offset",
    """SELECT o_orderkey, o_totalprice AS totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20 OFFSET 10""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(10)
      .limit(20)
      .select(col("o_orderkey"), col("o_totalprice").as("totalprice"))
  }

  /** Regex extraction over semi-structured text (events.props JSON-ish
    * payload) — regexp_extract is identical in both engines for this
    * pattern class. */
  val regex1: Q = Q(
    "r1_regexp_extract",
    """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .orderBy("k")
  }

  /** Math functions: exact ones raw (sqrt/abs/floor/ceil/power are
    * IEEE-deterministic), transcendentals rounded (libm vs java.lang.Math
    * can differ in the last ulp). */
  val math1: Q = Q(
    "math1_functions",
    """SELECT p_partkey,
      |  SQRT(p_retailprice) AS sqrt_price,
      |  ABS(p_retailprice - 1000.0) AS abs_diff,
      |  CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
      |  CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
      |  p_retailprice * p_retailprice AS price_sq,
      |  FLOOR(LN(p_retailprice)*1000000 + 0.5)/1000000 AS ln_price,
      |  CAST(p_size % 7 AS INT) AS size_mod
      |FROM part WHERE p_retailprice > 0 ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .filter(col("p_retailprice") > 0)
      .select(col("p_partkey"),
        sqrt(col("p_retailprice")).as("sqrt_price"),
        abs(col("p_retailprice") - 1000.0).as("abs_diff"),
        floor(col("p_retailprice")).as("floor_price"),
        ceil(col("p_retailprice")).as("ceil_price"),
        (col("p_retailprice") * col("p_retailprice")).as("price_sq"),
        Num.r6(log(col("p_retailprice"))).as("ln_price"),
        (col("p_size") % 7).as("size_mod"))
      .orderBy("p_partkey")
  }

  /** Custom typed Aggregator (UDAF surface): per-brand geometric mean of
    * retail price. Oracle = exp(avg(ln x)) — the same mergeable
    * formulation, rounded for float-order tolerance. */
  val geoMean: Q = Q(
    "agg1_geomean_udaf",
    """SELECT p_brand,
      |  FLOOR(EXP(AVG(LN(p_retailprice)))*10000 + 0.5)/10000 AS geo_mean_price,
      |  COUNT(*) AS n
      |FROM part WHERE p_retailprice > 0
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions.udaf
    val geo = udaf(graft.functions.GeoMeanAggregator,
      org.apache.spark.sql.Encoders.scalaDouble)
    t(s, dir, "part")
      .filter(col("p_retailprice") > 0)
      .groupBy("p_brand")
      .agg(Num.r4(geo(col("p_retailprice"))).as("geo_mean_price"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  /** Exact interpolated percentiles (Spark `percentile` ↔ DuckDB
    * `quantile_cont` share the linear-interpolation definition). */
  val percentiles: Q = Q(
    "pc1_percentiles",
    """SELECT o_orderstatus,
      |  FLOOR(quantile_cont(o_totalprice, 0.5)*10000 + 0.5)/10000 AS p50,
      |  FLOOR(quantile_cont(o_totalprice, 0.9)*10000 + 0.5)/10000 AS p90,
      |  FLOOR(quantile_cont(o_totalprice, 0.99)*10000 + 0.5)/10000 AS p99
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        Num.r4(expr("percentile(o_totalprice, 0.5)")).as("p50"),
        Num.r4(expr("percentile(o_totalprice, 0.9)")).as("p90"),
        Num.r4(expr("percentile(o_totalprice, 0.99)")).as("p99"))
      .orderBy("o_orderstatus")
  }

  /** Array functions over token arrays: membership, slicing, sorted
    * heads, dedup size. */
  val arrayFuncs: Q = Q(
    "a1_array_funcs",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |SELECT doc_id,
      |  list_contains(ws, 'spark') AS has_spark,
      |  CAST(len(ws) AS INT) AS n_tokens,
      |  array_to_string(list_sort(ws[1:3]), ',') AS head3_sorted,
      |  CAST(len(list_distinct(ws)) AS INT) AS n_distinct
      |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val ws = split(col("text"), " ")
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_contains(ws, "spark").as("has_spark"),
        size(ws).as("n_tokens"),
        concat_ws(",", sort_array(slice(ws, 1, 3))).as("head3_sorted"),
        size(array_distinct(ws)).as("n_distinct"))
      .orderBy("doc_id")
  }

  /** UNION ALL (bag semantics, no dedup shuffle). */
  val unionAll: Q = Q(
    "set0_union_all",
    """SELECT k, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS k FROM customer
      |  UNION ALL SELECT s_nationkey AS k FROM supplier
      |  UNION ALL SELECT n_nationkey AS k FROM nation) u
      |GROUP BY k ORDER BY k""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("k"))
      .unionAll(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
      .unionAll(t(s, dir, "nation").select(col("n_nationkey").as("k")))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .orderBy("k")
  }

  /** Window frames: first/last/nth value and ntile over explicit frames. */
  val windowFrames: Q = Q(
    "w3_window_frames",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_ok,
      |  last_value(o_orderkey) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
      |  nth_value(o_orderkey, 2) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok,
      |  CAST(ntile(4) OVER w AS INT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(wFull).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_ok"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Higher-order functions: lambda transform / filter / aggregate over
    * arrays (codegen-free but optimizer-visible — the declarative way to
    * process array columns without exploding them). */
  val higherOrder: Q = Q(
    "hof1_higher_order",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |SELECT doc_id,
      |  CAST(len(list_filter(ws, x -> length(x) > 4)) AS INT) AS n_long_tokens,
      |  array_to_string(list_transform(ws[1:2], x -> upper(x)), ' ') AS head2_uc,
      |  CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS total_chars
      |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        size(expr("filter(ws, x -> length(x) > 4)")).as("n_long_tokens"),
        concat_ws(" ", expr("transform(slice(ws, 1, 2), x -> upper(x))")).as("head2_uc"),
        expr("aggregate(ws, 0L, (acc, x) -> acc + length(x))").as("total_chars"))
      .orderBy("doc_id")
  }

  /** Unpivot (melt): wide per-part numeric columns to (metric, value)
    * rows — the inverse of p1_pivot. Oracle uses the portable UNION ALL
    * formulation of the same reshape. */
  val unpivot1: Q = Q(
    "u1_unpivot",
    """SELECT p_partkey, metric, value FROM (
      |  SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      |) u ORDER BY p_partkey, metric""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_retailprice").as("retail"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("retail"), col("size")),
        "metric", "value")
      .orderBy("p_partkey", "metric")
  }

  /** JSON path extraction over the semi-structured props column. */
  val json1: Q = Q(
    "j1_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)/100.0 AS total_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"), col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), Num.moneySum(col("value")).as("total_value"))
      .orderBy("k")
  }

  /** KMV (k-minimum-values) distinct-count sketch per group: unlike HLL
    * (whose register layout is engine-specific, so `q17_approx_distinct`
    * stays rows-only), KMV over a shared hash function is bit-identical
    * everywhere — estimate = (k-1)·2^60 / h_k over the k smallest
    * distinct 60-bit md5 hashes. The sketch state (k smallest hashes) is
    * mergeable, which is what a 1000-executor rollup needs; the exact
    * count rides along to show the error. */
  val kmvDistinct: Q = {
    val k = 64
    Q(
      "agg2_kmv_distinct",
      s"""WITH h AS (SELECT DISTINCT l_returnflag,
        |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |        ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        |      FROM h),
        |kth AS (SELECT l_returnflag, MAX(CASE WHEN rn = $k THEN h END) AS hk,
        |          COUNT(*) AS n_distinct
        |        FROM r GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n_distinct AS BIGINT) AS exact_distinct,
        |  ${Num.oraR4(s"($k - 1) * CAST(POW(2, 60) AS DOUBLE) / hk")} AS kmv_estimate
        |FROM kth ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val h = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          graft.queries.TextQueries.mdHash(col("l_partkey").cast("string")).as("h"))
        .distinct()
      val w = Window.partitionBy("l_returnflag").orderBy("h")
      h.withColumn("rn", row_number().over(w))
        .groupBy("l_returnflag")
        .agg(max(when(col("rn") === k, col("h"))).as("hk"),
          count(lit(1)).as("exact_distinct"))
        .select(col("l_returnflag"), col("exact_distinct"),
          Num.r4(lit(k - 1) * pow(lit(2), lit(60)) / col("hk")).as("kmv_estimate"))
        .orderBy("l_returnflag")
    }
  }

  /** Z-order (Morton) clustering key — the data-layout primitive behind
    * multi-dimensional file pruning at 100 TB (Delta/Iceberg
    * OPTIMIZE ZORDER): interleave the bits of two dimensions so rows
    * close in BOTH dimensions land in the same sort range, then show
    * per-range locality (each 1/64th of the z-space covers a bounded
    * box of both dims, which is exactly why min/max file stats can
    * prune on either column after a z-sort). Pure 64-bit bit
    * arithmetic — identical in both engines. */
  val zorder: Q = {
    val bits = 10
    def zExpr(x: String, y: String): String = (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    Q(
      "z1_zorder_cluster",
      s"""WITH d AS (SELECT user_id % 1024 AS x, event_id % 1024 AS y FROM events),
        |z AS (SELECT x, y, ${zExpr("x", "y")} AS zval FROM d)
        |SELECT (zval >> 14) AS z_range, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
        |  CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events")
        .select(pmod(col("user_id"), lit(1024)).cast("long").as("x"),
          pmod(col("event_id"), lit(1024)).cast("long").as("y"))
      val z = d.select(col("x"), col("y"), expr(zExpr("x", "y")).as("zval"))
      z.groupBy(expr("zval >> 14").as("z_range"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .orderBy("z_range")
    }
  }

  /** Data-quality profile: per-column row/non-null/distinct counts in
    * ONE scan — columns melt into (name, value-as-string) pairs, then a
    * single groupBy(name) aggregates. The string cast only needs to be
    * injective for the distinct count to be exact, so cross-engine
    * float-repr differences cannot matter (the value itself is
    * aggregated away). The profiling pass every ingest pipeline runs
    * before trusting a new drop; at 100 TB it is one shuffle whose key
    * cardinality is the column count. */
  val profile: Q = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_returnflag", "l_shipdate")
    Q(
      "dq1_profile",
      s"""WITH m AS (
        |  ${cols.map(c => s"SELECT '$c' AS c, $c::VARCHAR AS v FROM lineitem")
               .mkString("\n  |  UNION ALL ")}
        |)
        |SELECT c AS col_name, COUNT(*) AS n_rows,
        |  COUNT(v) AS n_nonnull, COUNT(DISTINCT v) AS n_distinct
        |FROM m GROUP BY c ORDER BY c""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val melted = li.select(explode(array(
        cols.map(c => struct(lit(c).as("c"), col(c).cast(StringType).as("v"))): _*))
        .as("kv"))
        .select(col("kv.c").as("c"), col("kv.v").as("v"))
      melted.groupBy("c")
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_nonnull"),
          countDistinct(col("v")).as("n_distinct"))
        .select(col("c").as("col_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"))
        .orderBy("col_name")
    }
  }

  /** LATERAL correlated subquery with per-row ORDER BY + LIMIT — the
    * top-N-per-group shape expressed the way an interactive SQL user
    * writes it (a correlated derived table, not a window): Spark plans
    * the correlated LIMIT as a LateralJoin over a per-key top-k, and
    * the oracle runs the IDENTICAL text. Output deterministic via the
    * outer (custkey, orderkey) sort; the top-2 SET per customer is
    * order-free. */
  val lateralTopN: Q = {
    val sql =
      """SELECT c.c_custkey, o.o_orderkey, o.totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice AS totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey <= 200
        |ORDER BY c_custkey, o_orderkey""".stripMargin
    Q("sub3_lateral_topn", sql) { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(sql)
    }
  }

  /** Bag-semantics set ops: EXCEPT ALL keeps multiplicity (an order key
    * appearing n times with m matching customers survives max(n−m, 0)
    * times), INTERSECT ALL keeps min(n, m) — the multiset algebra
    * DISTINCT-flavored set0–set3 don't exercise. */
  val exceptAll: Q = Q(
    "set4_except_all",
    """SELECT k FROM (
      |  SELECT o_custkey AS k FROM orders
      |  EXCEPT ALL
      |  SELECT c_custkey AS k FROM customer) e
      |ORDER BY k""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(col("o_custkey").as("k"))
      .exceptAll(t(s, dir, "customer").select(col("c_custkey").as("k")))
      .orderBy("k")
  }

  val intersectAll: Q = Q(
    "set5_intersect_all",
    """SELECT k FROM (
      |  SELECT o_custkey AS k FROM orders
      |  INTERSECT ALL
      |  SELECT c_custkey AS k FROM customer) i
      |ORDER BY k""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(col("o_custkey").as("k"))
      .intersectAll(t(s, dir, "customer").select(col("c_custkey").as("k")))
      .orderBy("k")
  }

  /** Distribution window functions: quartile bucketing (ntile),
    * percent_rank and cume_dist per nation — integer-derived doubles
    * (rank/count arithmetic), r4-rounded so the gate is safe at any
    * representation boundary. */
  val windowDistribution: Q = Q(
    "w4_window_distribution",
    """SELECT c_custkey, c_nationkey,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  FLOOR(percent_rank() OVER w * 10000 + 0.5)/10000 AS pr,
      |  FLOOR(cume_dist() OVER w * 10000 + 0.5)/10000 AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(w).as("quartile"),
        Num.r4(percent_rank().over(w)).as("pr"),
        Num.r4(cume_dist().over(w)).as("cd"))
      .orderBy("c_custkey")
  }

  /** Edit-distance fuzzy matching (levenshtein — both engines implement
    * the standard Wagner–Fischer distance, integer-exact): per-nation
    * near-identical customer-name pairs, the record-linkage primitive a
    * dedup pipeline uses on SHORT keys where shingling is meaningless.
    *
    * Blocking is COMPOSITE and MULTI-PASS (round-14 verdict watch item,
    * re-windowed per round-15 advice): nationkey alone has 25 distinct
    * values, so candidate pairs grew quadratically with customer count
    * (~9×10¹⁰ at sf10-scale). The r15 second component was the name's
    * LEADING digit window `substr(c_name, 10, 3)` — wrong on both
    * axes: custkeys fill from the small end, so at sf10 (custkey ≤
    * 1.5M) the leading window holds only 2 values (no pair bounding),
    * and once custkey crosses 10⁶ genuinely-close pairs start differing
    * in it (Customer#000100000 vs #001100000, distance 1, blocked
    * apart) — a semantics cliff at exactly the bench SFs. The windows
    * are now the MIDDLE digits `substr(c_name, 13, 3)` and the SUFFIX
    * digits `substr(c_name, 16, 3)` of the fixed 9-digit
    * `Customer#`-prefixed form — both near-uniform at every SF (blocks
    * stay ~N/25000) — as TWO equi-join blocking passes whose candidate
    * union is deduplicated before scoring (the standard multi-pass
    * blocking of record linkage; an OR join condition would degrade to
    * a per-nation nested loop). A dist ≤ 3 pair is unseen only when
    * its edits touch BOTH windows (≥ 2 edits split across digits 4–6
    * and 7–9) — in particular every 1-edit pair is caught at every SF,
    * including the leading-digit pairs the r15 window dropped. The
    * distance is projected ONCE per distinct candidate before the
    * threshold filter and the MIN aggregate. */
  val fuzzyNames: Q = Q(
    "str2_edit_distance",
    """SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(MIN(dist) AS INT) AS min_dist
      |FROM (
      |  SELECT nk, levenshtein(an, bn) AS dist
      |  FROM (
      |    SELECT a.c_nationkey AS nk, a.c_custkey AS ak, b.c_custkey AS bk,
      |           a.c_name AS an, b.c_name AS bn
      |    FROM customer a JOIN customer b
      |      ON a.c_nationkey = b.c_nationkey
      |     AND substr(a.c_name, 13, 3) = substr(b.c_name, 13, 3)
      |     AND a.c_custkey < b.c_custkey
      |    UNION
      |    SELECT a.c_nationkey, a.c_custkey, b.c_custkey, a.c_name, b.c_name
      |    FROM customer a JOIN customer b
      |      ON a.c_nationkey = b.c_nationkey
      |     AND substr(a.c_name, 16, 3) = substr(b.c_name, 16, 3)
      |     AND a.c_custkey < b.c_custkey) cand) p
      |WHERE dist <= 3
      |GROUP BY nk ORDER BY nk""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    def blockingPass(from: Int): org.apache.spark.sql.DataFrame = {
      val a = c.select(col("c_custkey").as("ak"), col("c_nationkey").as("nk"),
        col("c_name").as("an"), substring(col("c_name"), from, 3).as("ablk"))
      val b = c.select(col("c_custkey").as("bk"), col("c_nationkey").as("bnk"),
        col("c_name").as("bn"), substring(col("c_name"), from, 3).as("bblk"))
      a.join(b, col("nk") === col("bnk") && col("ablk") === col("bblk") &&
          col("ak") < col("bk"))
        .select("nk", "ak", "bk", "an", "bn")
    }
    blockingPass(13).union(blockingPass(16)).distinct()
      .withColumn("dist", levenshtein(col("an"), col("bn")))
      .filter(col("dist") <= 3)
      .groupBy(col("nk"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("dist")).cast("int").as("min_dist"))
      .orderBy("nk")
  }

  val all: Seq[Q] = Seq(pivot1, explode1, offset1, regex1, math1, geoMean,
    percentiles, arrayFuncs, unionAll, windowFrames, higherOrder, unpivot1, json1,
    kmvDistinct, zorder, profile, lateralTopN, exceptAll, intersectAll,
    windowDistribution, fuzzyNames)
}
