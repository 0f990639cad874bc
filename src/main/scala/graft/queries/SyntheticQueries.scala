package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** The reference's own synthetic star fixture and SQL entry surface.
  *
  * base_table/small_table_N mirror `/root/reference/benches/
  * my_benchmark.rs:84-107` (ids cycle mod DIM_ROWS, constant value
  * column) and `/root/reference/src/lib.rs:796-828`; the four-table
  * right-deep join is FOUR_TABLE_SQL (`my_benchmark.rs:122-140`).
  * Generated with `spark.range` — distributed, no driver-side data —
  * so the same generator scales to the bench sizes (10,000×1,024 rows)
  * and beyond.
  */
object SyntheticQueries {

  /** Fact rows; dims are FACT_ROWS/40 with ids cycling mod DIM_ROWS —
    * compact enough for the correctness gate, same shape as the bench. */
  private val FACT_ROWS = 1024 * 1000L
  private val DIM_ROWS = 256 * 100L

  def baseTable(spark: SparkSession, rows: Long = FACT_ROWS, dimRows: Long = DIM_ROWS): DataFrame =
    spark.range(0, rows, 1, 32).select(
      (col("id") % dimRows).cast("int").as("id1"),
      ((col("id") + 1) % dimRows).cast("int").as("id2"),
      ((col("id") + 2) % dimRows).cast("int").as("id3"),
      ((col("id") + 3) % dimRows).cast("int").as("id4"),
      lit("hello").as("value"))

  def smallTable(spark: SparkSession, n: Int, dimRows: Long = DIM_ROWS): DataFrame =
    spark.range(0, dimRows, 1, 8).select(
      (col("id") + n).cast("int").as(s"id"),
      lit("world").as("value"))

  /** The reference's right-deep 4-join star over the synthetic fixture,
    * aggregated to a stable scalar row. Oracle generates the identical
    * fixture with DuckDB's range(). */
  val starSynthetic: Q = Q(
    "x1_star_synthetic",
    s"""WITH base_table AS (
      |  SELECT CAST(i % $DIM_ROWS AS INT) AS id1, CAST((i+1) % $DIM_ROWS AS INT) AS id2,
      |         CAST((i+2) % $DIM_ROWS AS INT) AS id3, CAST((i+3) % $DIM_ROWS AS INT) AS id4
      |  FROM range($FACT_ROWS) t(i)),
      |st1 AS (SELECT CAST(i + 1 AS INT) AS id FROM range($DIM_ROWS) t(i)),
      |st2 AS (SELECT CAST(i + 2 AS INT) AS id FROM range($DIM_ROWS) t(i)),
      |st3 AS (SELECT CAST(i + 3 AS INT) AS id FROM range($DIM_ROWS) t(i)),
      |st4 AS (SELECT CAST(i + 4 AS INT) AS id FROM range($DIM_ROWS) t(i))
      |SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(b.id1 AS BIGINT)) AS BIGINT) AS sum_id1,
      |  CAST(SUM(CAST(s4.id AS BIGINT)) AS BIGINT) AS sum_id4
      |FROM base_table b
      |JOIN st1 s1 ON b.id1 = s1.id
      |JOIN st2 s2 ON b.id2 = s2.id
      |JOIN st3 s3 ON b.id3 = s3.id
      |JOIN st4 s4 ON b.id4 = s4.id""".stripMargin) { (s, _) =>
    val b = baseTable(s)
    val joined = b
      .join(broadcast(smallTable(s, 1)).withColumnRenamed("id", "s1_id"), col("id1") === col("s1_id"))
      .join(broadcast(smallTable(s, 2)).withColumnRenamed("id", "s2_id"), col("id2") === col("s2_id"))
      .join(broadcast(smallTable(s, 3)).withColumnRenamed("id", "s3_id"), col("id3") === col("s3_id"))
      .join(broadcast(smallTable(s, 4)).withColumnRenamed("id", "s4_id"), col("id4") === col("s4_id"))
    joined.agg(
      count(lit(1)).as("n_rows"),
      sum(col("id1").cast("long")).as("sum_id1"),
      sum(col("s4_id").cast("long")).as("sum_id4"))
  }

  /** SQL entry surface (the reference's `parse_sql` / `ctx.sql` path,
    * `/root/reference/src/parse_sql.rs:73-76`): register parquet views,
    * run a textual query through spark.sql. */
  val sqlEntry: Q = Q(
    "x2_sql_entry",
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT))/100.0 AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment <> 'BUILDING'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    // NB: in Spark SQL text `100.0` parses as DECIMAL — cast to DOUBLE to
    // match the DataFrame-API arithmetic and the oracle's float division.
    s.sql(
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) / CAST(100 AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment <> 'BUILDING'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** In-memory cached table provider (reference O22 `StaticTable` /
    * MemTable: `/root/reference/tpc/src/main.rs:386-412` loads parquet
    * into memory before querying): cache + temp view + SQL over it. */
  val cachedTable: Q = Q(
    "x3_cached_table",
    """SELECT n_regionkey, COUNT(*) AS n_nations FROM nation
      |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
    val cached = Tables.t(s, dir, "nation").cache()
    cached.createOrReplaceTempView("nation_cached")
    s.sql(
      """SELECT n_regionkey, COUNT(*) AS n_nations FROM nation_cached
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
  }

  /** Recursive CTE (Spark 4 WITH RECURSIVE): a month ladder spanning the
    * order history, left-joined to per-month order counts — gaps stay
    * visible as zero months, which a plain GROUP BY cannot produce. */
  val recursiveCte: Q = {
    val sql =
      """WITH RECURSIVE seq(n) AS (
        |  SELECT 0
        |  UNION ALL SELECT n + 1 FROM seq WHERE n < 79
        |)
        |SELECT n AS month_idx, COUNT(o_orderkey) AS n_orders
        |FROM seq LEFT JOIN orders
        |  ON CAST(extract(year FROM o_orderdate) AS INT) * 12
        |     + CAST(extract(month FROM o_orderdate) AS INT) - (1995 * 12 + 1) = n
        |GROUP BY n ORDER BY n""".stripMargin
    Q("rec1_recursive_cte", sql) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(starSynthetic, sqlEntry, cachedTable, recursiveCte)
}
