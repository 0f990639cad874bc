package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables.t

/** Runtime bloom-filter join pruning: a selective dimension filter
  * injects a `might_contain` probe into the fact-side scan, so the big
  * side drops non-joining rows BEFORE the shuffle — at 100 TB this is
  * the difference between shuffling the whole fact table and shuffling
  * the ~matching slice. Thresholds are forced down so the optimization
  * triggers at test scale; the plan assert is on the injected
  * BloomFilterMightContain, results checked against the un-filtered run. */
class RuntimeFilterSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom probe into the fact scan") {
    def query() = {
      val part = t(spark, dir, "part").filter(col("p_size") === 1)
        .select(col("p_partkey"), col("p_name"))
      val li = t(spark, dir, "lineitem").select(col("l_partkey"), col("l_quantity"))
      li.join(part, col("l_partkey") === col("p_partkey"))
    }
    val expected = query().collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // bloom applies to shuffle joins
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val d = query()
      val planStr = d.queryExecution.optimizedPlan.toString
      assert(planStr.contains("might_contain"),
        s"expected an injected bloom-filter probe, got:\n$planStr")
      assert(d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|")) == expected)
    }
  }
}
