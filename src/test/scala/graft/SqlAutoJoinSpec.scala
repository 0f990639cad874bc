package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.plans.{AutoParallelJoin, ParallelHashJoinApi, ParallelHashJoinExec}

/** End-to-end proof that ordinary `spark.sql` text plans through the
  * custom exec — the Spark analog of the reference's plan downcasts
  * after running SQL with `UseParallelHashJoinRule` installed
  * (`/root/reference/src/lib.rs:728-753`), including the rule's
  * fall-through guards (`use_parallel_hash_join_rule.rs:78-92`). */
class SqlAutoJoinSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    ParallelHashJoinApi.install(s)
    Tables.registerAll(s, dir)
    s
  }

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: inner.flatMap(flatten)
  }

  private def finalPlan(d: DataFrame): Seq[SparkPlan] = {
    d.collect() // finalize AQE
    flatten(d.queryExecution.executedPlan)
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val joinSql =
    """SELECT n_nationkey, n_name, r_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin

  private lazy val golden = spark.sql(joinSql).collect().toSeq

  test("auto=required plans plain SQL joins through ParallelHashJoinExec") {
    golden // force OUTSIDE withConf: must come from Spark's built-in join
    withConf(AutoParallelJoin.autoConfKey -> "required") {
      val d = spark.sql(joinSql)
      assert(finalPlan(d).exists(_.isInstanceOf[ParallelHashJoinExec]),
        "expected ParallelHashJoinExec in the physical plan")
      assert(d.collect().toSeq == golden)
    }
  }

  test("auto=true respects the broadcast guard (partitioned-mode-only, rs:84-86)") {
    // tiny sides under the default 10 MB threshold → Spark would
    // broadcast → rule must fall through to the built-in strategies
    withConf(AutoParallelJoin.autoConfKey -> "true") {
      val d = spark.sql(joinSql)
      val plan = finalPlan(d)
      assert(!plan.exists(_.isInstanceOf[ParallelHashJoinExec]),
        "broadcast-eligible join must not convert under guarded mode")
      assert(plan.exists(_.isInstanceOf[BroadcastHashJoinExec]))
      // with broadcast disabled, the same SQL converts
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val d2 = spark.sql(joinSql)
        assert(finalPlan(d2).exists(_.isInstanceOf[ParallelHashJoinExec]),
          "non-broadcastable equi-join must convert under guarded mode")
        assert(d2.collect().toSeq == golden)
      }
    }
  }

  test("auto off leaves planning untouched") {
    val d = spark.sql(joinSql)
    assert(!finalPlan(d).exists(_.isInstanceOf[ParallelHashJoinExec]))
  }

  test("null-safe equality falls through (null_equals_null guard, rs:87-89)") {
    withConf(AutoParallelJoin.autoConfKey -> "required",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val d = spark.sql(
        "SELECT n_nationkey FROM nation JOIN region ON n_regionkey <=> r_regionkey")
      assert(!finalPlan(d).exists(_.isInstanceOf[ParallelHashJoinExec]),
        "<=> join must not use the custom exec")
      // and results still come from Spark's built-ins, unchanged
      assert(d.collect().length == 25)
    }
  }

  test("non-equi-only join falls through") {
    withConf(AutoParallelJoin.autoConfKey -> "required") {
      val d = spark.sql(
        "SELECT COUNT(*) AS n FROM nation JOIN region ON n_regionkey < r_regionkey")
      assert(!finalPlan(d).exists(_.isInstanceOf[ParallelHashJoinExec]))
    }
  }

  test("every join type converts and matches built-in results via SQL text") {
    val sqls = Seq(
      "SELECT p_partkey, l_orderkey FROM part JOIN lineitem ON p_partkey = l_partkey",
      "SELECT p_partkey, l_orderkey FROM part LEFT OUTER JOIN lineitem ON p_partkey = l_partkey",
      "SELECT p_partkey, l_orderkey FROM part RIGHT OUTER JOIN lineitem ON p_partkey = l_partkey",
      "SELECT p_partkey, l_orderkey FROM part FULL OUTER JOIN lineitem ON p_partkey = l_partkey",
      "SELECT p_partkey FROM part LEFT SEMI JOIN lineitem ON p_partkey = l_partkey",
      "SELECT p_partkey FROM part LEFT ANTI JOIN lineitem ON p_partkey = l_partkey")
    for (sql <- sqls) {
      val expected = spark.sql(sql).collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
      withConf(AutoParallelJoin.autoConfKey -> "required") {
        val d = spark.sql(sql)
        assert(finalPlan(d).exists(_.isInstanceOf[ParallelHashJoinExec]), s"convert: $sql")
        assert(d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|")) == expected, s"results: $sql")
      }
    }
  }

  test("parallelSql rewrites the logical plan and survives re-planning") {
    val d = AutoParallelJoin.parallelSql(spark, joinSql)
    assert(d.queryExecution.analyzed.collect {
      case p: graft.plans.ParallelHashJoin => p
    }.nonEmpty, "logical ParallelHashJoin node expected")
    assert(finalPlan(d).exists(_.isInstanceOf[ParallelHashJoinExec]))
    assert(d.collect().toSeq == golden)
  }

  test("parallelSql converts both joins of a 3-way query") {
    val d = AutoParallelJoin.parallelSql(spark,
      """SELECT c_mktsegment, COUNT(*) AS n
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment""".stripMargin)
    assert(d.queryExecution.analyzed.collect {
      case p: graft.plans.ParallelHashJoin => p
    }.size == 2)
    assert(finalPlan(d).count(_.isInstanceOf[ParallelHashJoinExec]) == 2)
  }

  test("DataFrame-API joins also convert under the auto conf") {
    withConf(AutoParallelJoin.autoConfKey -> "required") {
      val nation = graft.engine.Tables.t(spark, dir, "nation")
      val region = graft.engine.Tables.t(spark, dir, "region")
      val d = nation.join(region,
        nation("n_regionkey") === region("r_regionkey"))
      assert(finalPlan(d).exists(_.isInstanceOf[ParallelHashJoinExec]),
        "df.join must plan through the custom exec too")
      assert(d.count() == 25)
    }
  }

  test("parallelSql refuses a statement with nothing to convert") {
    intercept[IllegalArgumentException] {
      AutoParallelJoin.parallelSql(spark, "SELECT 1 AS one")
    }
  }
}
