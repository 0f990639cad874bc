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
  * values, so casting them to DECIMAL *before* aggregating makes the
  * arithmetic exact — both engines then produce the identical value.
  * Final casts pin precision/scale so the output schema matches too.
  */
object Num {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact sum of a 2-decimal double column. The sum itself is decimal
    * (exact); the final cast to double is deterministic (nearest double
    * of the same exact value in both engines), and double survives the
    * parquet→pandas and duckdb→pandas bridges identically — decimal
    * does not (pyarrow yields Decimal objects, duckdb yields float64). */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** l_extendedprice * (1 - l_discount) in exact decimal (scale 6). */
  def discPrice(price: Column, discount: Column): Column =
    dec2(price) * dec4(lit(1) - discount)

  /** Exact revenue sum, surfaced as double (see moneySum). */
  def revenueSum(price: Column, discount: Column): Column =
    sum(discPrice(price, discount)).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count, rounded in double.
    * Division of identical operands is IEEE-deterministic in both engines. */
  def avgOf(sumDec: Column, n: Column): Column =
    round(sumDec.cast(DoubleType) / n, 4)
}
