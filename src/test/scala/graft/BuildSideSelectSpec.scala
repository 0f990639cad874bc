package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AutoParallelJoin, ParallelHashJoinApi, ParallelHashJoinExec, ParallelHashJoinStrategy}

/** Pins the conditional build-side selection on the transparent path
  * (round-10 verdict #6): an auto-converted `LeftSemi`/`LeftAnti` whose
  * right side is ≥3× smaller by stats must plan as the probe-preserving
  * kernel with swapped children (build = small right side), produce
  * results identical to the stock planner, and revert to the faithful
  * build-left shape when `sideSelect=false` — while the EXPLICIT API
  * keeps the reference's fixed build-left regardless. */
class BuildSideSelectSpec extends AnyFunSuite {

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

  private def fact = spark.range(0, 100000, 1, 4)
    .select((col("id") % 2000).as("k"), col("id").as("v"))
  private def dim = spark.range(0, 500, 1, 2).select(col("id").as("d_k"))

  private def phjOf(df: org.apache.spark.sql.DataFrame): ParallelHashJoinExec = {
    df.collect() // finalize any adaptive plan before inspecting it
    val execs = flatten(df.queryExecution.executedPlan)
      .collect { case p: ParallelHashJoinExec => p }
    assert(execs.size == 1, s"expected one ParallelHashJoinExec, got $execs")
    execs.head
  }

  test("auto semi/anti with a 3x-smaller right side builds the right side (probe-preserving swap)") {
    for (jt <- Seq("left_semi", "left_anti")) {
      val golden = fact.join(dim, col("k") === col("d_k"), jt)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      withConf(AutoParallelJoin.autoConfKey -> "required") {
        val df = fact.join(dim, col("k") === col("d_k"), jt)
        val exec = phjOf(df)
        assert(exec.probePreserving,
          s"$jt with small right side should take the swapped probe-preserving shape")
        // swapped: the build (left) child subtree carries d_k, the
        // probe (right) child carries the preserved fact columns
        assert(exec.left.output.map(_.name).contains("d_k"))
        assert(exec.right.output.map(_.name) == Seq("k", "v"))
        val rows = df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
        assert(rows == golden, s"$jt diverged under side-selected swap")
      }
    }
  }

  test("sideSelect=false keeps the faithful build-left shape; near-equal sides never swap") {
    withConf(AutoParallelJoin.autoConfKey -> "required",
        ParallelHashJoinStrategy.sideSelectConfKey -> "false") {
      val exec = phjOf(fact.join(dim, col("k") === col("d_k"), "left_semi"))
      assert(!exec.probePreserving, "sideSelect=false must keep build-left")
      assert(exec.left.output.map(_.name) == Seq("k", "v"))
    }
    withConf(AutoParallelJoin.autoConfKey -> "required") {
      // same-size sides: under the 3x stats threshold — no swap
      val a = spark.range(0, 1000, 1, 2).select(col("id").as("k"))
      val b = spark.range(0, 1000, 1, 2).select(col("id").as("d_k"))
      val exec = phjOf(a.join(b, col("k") === col("d_k"), "left_semi"))
      assert(!exec.probePreserving, "near-equal sides must keep build-left")
    }
  }

  test("the explicit API stays reference-faithful (build-left) regardless of sideSelect") {
    val df = ParallelHashJoinApi.parallelHashJoin(
      fact, dim, Seq("k"), Seq("d_k"), "left_semi")
    val exec = phjOf(df)
    assert(!exec.probePreserving)
    assert(exec.left.output.map(_.name) == Seq("k", "v"),
      "explicit left_semi must build its left input, as the reference's rule does")
  }
}
