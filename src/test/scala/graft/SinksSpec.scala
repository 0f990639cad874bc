package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage beyond the Verify parquet path: CSV and JSON
  * round trips (the reference writes CSV answers and JSON metrics,
  * `/root/reference/tpc/src/main.rs:271-287,369-377`), plus the HLL
  * sketch error bound. */
class SinksSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("CSV sink/source round trip preserves the q1 answer") {
    val out = Files.createTempDirectory("graft_csv").toString
    val q1 = SparkEntry.queries("q1_pricing_summary")(spark, dir)
    q1.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == q1.count())
    val a = q1.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val b = back.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(a.map(_.mkString("|")).toSeq == b.map(_.mkString("|")).toSeq)
  }

  test("JSON sink/source round trip preserves row count and schema names") {
    val out = Files.createTempDirectory("graft_json").toString
    val d = SparkEntry.queries("e2_user_stats")(spark, dir)
    d.write.mode("overwrite").json(out)
    val back = spark.read.json(out)
    assert(back.count() == d.count())
    assert(back.columns.sorted.toSeq == d.columns.sorted.toSeq)
  }

  test("driver contract: entry returns rows and every query has a fn") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "every oracle key must have a query")
    assert(SparkEntry.queries.size >= 80)
  }

  test("approx_count_distinct within declared error of exact") {
    val rows = SparkEntry.queries("q17_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    // the bound check is now an output column (hash-gated by the
    // oracle); every group's HLL estimate must sit within the bound
    rows.foreach { r =>
      assert(r.getBoolean(3),
        s"HLL estimate out of bound for group ${r.getString(0)}")
    }
  }
}
