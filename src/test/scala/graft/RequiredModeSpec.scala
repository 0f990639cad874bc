package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AutoParallelJoin, ParallelHashJoinApi, ParallelHashJoinExec}

/** Permanent CI coverage for transparent `auto=required` conversion —
  * a representative slice of the inventory runs with EVERY equi-join
  * forced through the custom exec (the reference's `new_required` mode,
  * `parse_sql.rs:48-50`) and must produce byte-identical results to the
  * stock planner, with the downcast verified in the physical plan.
  * Previously this soak only ran via the driver's
  * `SPARK_GRAFT_EXTRA_CONF` hook; this suite pins it inside plain
  * `sbt test` (round-4 verdict item #7). */
class RequiredModeSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  // join-bearing slice across the surface: TPC-H shapes (incl. semi/
  // anti subqueries), star schema, customer-orders outer join, LSH
  private val joinQueries = Seq(
    "q3_shipping_priority", "q5_local_supplier", "q9_profit",
    "q18_large_orders", "q21_waiting_orders", "star_join4",
    "j_left_outer", "j_residual_filter", "q13_customer_distribution",
    "t6_minhash_lsh")
  // conversion must be a no-op or results-neutral: no equi-join at all,
  // or (e5) an as-of join whose range predicate the rule must skip
  private val noJoinQueries = Seq("q1_pricing_summary", "t1_dedup_exact")
  private val unconvertedQueries = Seq("e5_asof_join")

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    ParallelHashJoinApi.install(s)
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

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def run(name: String): (Seq[Seq[Any]], Seq[SparkPlan]) = {
    val d = SparkEntry.queries(name)(spark, dir)
    val rows = d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    (rows, flatten(d.queryExecution.executedPlan))
  }

  test("required mode: slice results match stock planner, joins downcast") {
    val golden = (joinQueries ++ noJoinQueries ++ unconvertedQueries)
      .map(n => n -> run(n)._1).toMap
    withConf(AutoParallelJoin.autoConfKey -> "required") {
      for (name <- joinQueries) {
        val (rows, plan) = run(name)
        assert(rows == golden(name), s"$name diverged under auto=required")
        assert(plan.exists(_.isInstanceOf[ParallelHashJoinExec]),
          s"$name expected a ParallelHashJoinExec downcast under required mode")
      }
      for (name <- noJoinQueries) {
        val (rows, plan) = run(name)
        assert(rows == golden(name), s"$name diverged under auto=required")
        assert(!plan.exists(_.isInstanceOf[ParallelHashJoinExec]),
          s"$name has no equi-join; conversion must be a no-op")
      }
      // range-predicate joins fall through the rule's guards but must
      // still produce identical results with the rule installed
      for (name <- unconvertedQueries) {
        assert(run(name)._1 == golden(name), s"$name diverged under auto=required")
      }
    }
  }
}
