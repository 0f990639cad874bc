package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The storage-layout levers that matter at 100 TB: bucketed tables
  * co-locate join keys so the shuffle disappears entirely, and
  * partition directories prune at planning time so the scan never
  * touches irrelevant data. Both are asserted on the physical plan,
  * not just on results. */
class StorageLayoutSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft_wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: inner.flatMap(flatten)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    import graft.engine.Tables.t
    t(spark, dir, "orders").write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    t(spark, dir, "customer").write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
    // disable broadcasting in BOTH the static planner and AQE's runtime
    // re-planner — AQE has a separate threshold and will happily turn a
    // shuffle-free bucketed SMJ into a broadcast join otherwise
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val d = spark.table("customer_b")
        .join(spark.table("orders_b"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n"))
      d.collect()
      val nodes = flatten(d.queryExecution.executedPlan)
      val joinSubtree = nodes.find(p =>
        p.nodeName.contains("SortMergeJoin") || p.nodeName.contains("ShuffledHashJoin"))
      assert(joinSubtree.isDefined,
        s"expected a shuffled join over bucketed tables in:\n${d.queryExecution.executedPlan}")
      val shufflesBelowJoin = flatten(joinSubtree.get).count(_.isInstanceOf[ShuffleExchangeLike])
      assert(shufflesBelowJoin == 0,
        s"bucketed join should have no exchange below it:\n${joinSubtree.get}")
      assert(d.count() == spark.table("customer_b").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("partitioned parquet prunes partitions at the scan") {
    import graft.engine.Tables.t
    val out = Files.createTempDirectory("graft_part").toString
    t(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    val d = spark.read.parquet(out).filter(col("o_year") === 1996)
    val scans = d.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "partition filter should reach the scan")
    // only one year directory is read
    assert(scan.inputRDDs().head.partitions.nonEmpty)
    val expected = t(spark, dir, "orders").filter(year(col("o_orderdate")) === 1996).count()
    assert(d.count() == expected)
    val files = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files)
    assert(files.forall(_.getPath.toString.contains("o_year=1996")),
      "scan should only list the pruned partition directory")
  }

  test("ANALYZE TABLE computes statistics the optimizer can use") {
    import graft.engine.Tables.t
    t(spark, dir, "nation").write.mode("overwrite").saveAsTable("nation_s")
    try {
      spark.sql("ANALYZE TABLE nation_s COMPUTE STATISTICS")
      val tableStats = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("nation_s")).stats
      assert(tableStats.exists(_.rowCount.contains(BigInt(25))),
        s"row count stat: $tableStats")
      assert(tableStats.exists(_.sizeInBytes > 0))
      // column-level stats (distinct counts — what the reference's
      // StaticTable fakes to steer join sides, src/bin/main.rs:192-223)
      spark.sql("ANALYZE TABLE nation_s COMPUTE STATISTICS FOR COLUMNS n_nationkey")
      val cat = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("nation_s"))
      assert(cat.stats.exists(_.colStats.get("n_nationkey").exists(
        _.distinctCount.exists(_ == BigInt(25)))))
    } finally spark.sql("DROP TABLE IF EXISTS nation_s")
  }

  test("global temp view is reachable via 3-part name") {
    import graft.engine.Tables.t
    t(spark, dir, "region").createOrReplaceGlobalTempView("region_g")
    val n = spark.sql("SELECT COUNT(*) FROM global_temp.region_g").collect().head.getLong(0)
    assert(n == 5)
  }
}
