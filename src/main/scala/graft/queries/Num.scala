package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine numeric determinism helpers.
  *
  * The driver hash-compares our parquet output against a DuckDB oracle.
  * Floating-point SUMs are order-dependent, so a double sum computed by
  * Spark (partitioned, parallel) will not bit-match DuckDB's serial sum.
  * All source money/quantity columns in the testdata are 2-decimal
  * values, so we aggregate in **fixed-point long cents**: `round(x*100)`
  * is exactly the same integer in both engines (the double is within
  * 1e-9 of the true 2-decimal value, nowhere near a .5 boundary), long
  * addition is exact and order-free, and the final `/100.0` maps the
  * same long to the same double everywhere.
  *
  * Long-cents beats DECIMAL(38) aggregation ~10× in Spark (primitive
  * codegen'd sums vs BigDecimal), which is also the right call at
  * 100 TB — and overflow headroom is ample (2-decimal money sums reach
  * 9.2e16 dollars before a long overflows).
  */
object Num {
  /** x (2-decimal double) → exact integer cents. */
  def cents(c: Column): Column = round(c * 100, 0).cast(LongType)

  /** Exact sum of a 2-decimal double column, surfaced as double. */
  def moneySum(c: Column): Column = sum(cents(c)) / 100.0

  /** l_extendedprice * (1 - l_discount) in exact cents×cents (scale 4). */
  def discPrice4(price: Column, discount: Column): Column =
    cents(price) * cents(lit(1) - discount)

  /** Exact revenue sum as double (scale-4 fixed point internally). */
  def revenueSum(price: Column, discount: Column): Column =
    sum(discPrice4(price, discount)) / 10000.0

  /** Engine-stable half-up rounding: ROUND(x, k) diverges across
    * engines when x's shortest decimal repr lands exactly on a
    * (k+1)-th-decimal half (Spark rounds the string, DuckDB the
    * binary); floor(x*10^k + 0.5)/10^k is raw double arithmetic and
    * therefore bit-identical everywhere. Use for any rounded ratio. */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000.0
  def r6(c: Column): Column = floor(c * 1000000 + 0.5) / 1000000.0
  def oraR4(x: String): String = s"FLOOR(($x)*10000 + 0.5)/10000"
  def oraR6(x: String): String = s"FLOOR(($x)*1000000 + 0.5)/1000000"

  /** Deterministic average: exact long-cents sum / count, rounded in
    * double. Division of identical operands is IEEE-deterministic. */
  def avgCents(c: Column, n: Column): Column =
    r4(sum(cents(c)) / 100.0 / n)

  /** Oracle-side SQL fragments mirroring the helpers above. */
  val oraCents: String => String = x => s"CAST(ROUND(($x)*100, 0) AS BIGINT)"
  def oraMoneySum(x: String): String = s"SUM(${oraCents(x)})/100.0"
  def oraRevenueSum: String =
    "SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) * CAST(ROUND((1 - l_discount)*100, 0) AS BIGINT))/10000.0"
}
