package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables.t
import graft.plans.{ParallelHashJoinApi, ParallelHashJoinExec}

/** The reference's strategy-parameterized matrix (110 tests =
  * 10 scenarios × 11 engine configs, `/root/reference/src/lib.rs:36-60`):
  * here, every join type runs under four physical strategies —
  * sort-merge, shuffle-hash, broadcast, and our custom exec — with
  * identical results and plan-shape assertions per strategy (the
  * analog of the reference's `get_join_type` downcasts,
  * `/root/reference/src/lib.rs:728-753`). */
class JoinStrategyMatrixSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private val joinTypes =
    Seq("inner", "left_outer", "right_outer", "full_outer", "left_semi", "left_anti")

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def part = t(spark, dir, "part").select(col("p_partkey"), col("p_size"))
  private def li = t(spark, dir, "lineitem")
    .filter(col("l_quantity") >= 40.0)
    .select(col("l_partkey"), col("l_orderkey"))

  private def builtinJoin(jt: String): DataFrame =
    part.join(li, col("p_partkey") === col("l_partkey"), jt)

  private def collected(d: DataFrame): Seq[Seq[Any]] =
    d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  /** All physical nodes, descending through AQE query stages. */
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

  private lazy val golden: Map[String, Seq[Seq[Any]]] =
    joinTypes.map(jt => jt -> collected(builtinJoin(jt))).toMap

  test("sort-merge strategy matches golden for all join types") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      for (jt <- joinTypes) {
        val d = builtinJoin(jt)
        assert(collected(d) == golden(jt), s"results for $jt")
        assert(finalPlan(d).exists(_.isInstanceOf[SortMergeJoinExec]),
          s"expected SortMergeJoinExec for $jt")
      }
    }
  }

  test("shuffle-hash strategy matches golden for all join types") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      for (jt <- joinTypes) {
        val d = part.join(li.hint("SHUFFLE_HASH"),
          col("p_partkey") === col("l_partkey"), jt)
        assert(collected(d) == golden(jt), s"results for $jt")
        assert(finalPlan(d).exists(_.isInstanceOf[ShuffledHashJoinExec]),
          s"expected ShuffledHashJoinExec for $jt")
      }
    }
  }

  test("broadcast strategy matches golden where broadcastable") {
    // full outer cannot broadcast; semi/anti broadcast only the right side
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val d = part.join(org.apache.spark.sql.functions.broadcast(li),
        col("p_partkey") === col("l_partkey"), jt)
      assert(collected(d) == golden(jt), s"results for $jt")
      assert(finalPlan(d).exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"expected BroadcastHashJoinExec for $jt")
    }
  }

  test("custom parallel-hash strategy matches golden for all join types") {
    for (jt <- joinTypes) {
      val d = ParallelHashJoinApi.parallelHashJoin(
        part, li, Seq("p_partkey"), Seq("l_partkey"), jt)
      assert(collected(d) == golden(jt), s"results for $jt")
      assert(finalPlan(d).exists(_.isInstanceOf[ParallelHashJoinExec]),
        s"expected ParallelHashJoinExec for $jt")
    }
  }

  test("inner joins run inside WholeStageCodegen with same results") {
    val d = ParallelHashJoinApi.parallelHashJoin(
      part, li, Seq("p_partkey"), Seq("l_partkey"), "inner")
    assert(collected(d) == golden("inner"))
    val plan = finalPlan(d)
    val wscg = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.exists(_.collectFirst {
      case p: ParallelHashJoinExec => p
    }.isDefined), "expected ParallelHashJoinExec fused into a codegen stage")
    // the residual-condition codegen path
    val dc = ParallelHashJoinApi.parallelHashJoin(
      part, li, Seq("p_partkey"), Seq("l_partkey"), "inner",
      Some(col("p_size") > 25))
    val expected = collected(part.join(li,
      col("p_partkey") === col("l_partkey") && col("p_size") > 25))
    assert(collected(dc) == expected)
    // knob off → interpreted path, same results, exec not fused
    withConf(ParallelHashJoinExec.codegenEnabledKey -> "false") {
      val di = ParallelHashJoinApi.parallelHashJoin(
        part, li, Seq("p_partkey"), Seq("l_partkey"), "inner")
      assert(collected(di) == golden("inner"))
      val fused = finalPlan(di).collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.exists(_.collectFirst { case p: ParallelHashJoinExec => p }.isDefined)
      assert(!fused, "knob off must keep the exec out of codegen stages")
    }
  }

  test("build-finalizer types fuse into codegen with same results") {
    // fallback=false turns a generated-code compile failure into a hard
    // error instead of a silent interpreted fallback — this is the test
    // that proves the finalizer kernels actually compile and run
    withConf("spark.sql.codegen.fallback" -> "false") {
      for (jt <- Seq("left_outer", "right_outer", "full_outer", "left_semi", "left_anti")) {
        val d = ParallelHashJoinApi.parallelHashJoin(
          part, li, Seq("p_partkey"), Seq("l_partkey"), jt)
        assert(collected(d) == golden(jt), s"results for $jt")
        val fused = finalPlan(d).collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
        }.exists(_.collectFirst { case p: ParallelHashJoinExec => p }.isDefined)
        assert(fused, s"expected $jt fused into a codegen stage")
      }
      // residual conditions through the marking/finalizer paths
      for (jt <- Seq("left_outer", "full_outer", "left_semi", "left_anti")) {
        val dc = ParallelHashJoinApi.parallelHashJoin(
          part, li, Seq("p_partkey"), Seq("l_partkey"), jt,
          Some(col("p_size") > 25))
        val expected = collected(part.join(li,
          col("p_partkey") === col("l_partkey") && col("p_size") > 25, jt))
        assert(collected(dc) == expected, s"residual results for $jt")
      }
    }
  }

  test("codegen impl knob plans Spark's shuffled-hash exec with same results") {
    withConf(graft.plans.ParallelHashJoinStrategy.implConfKey -> "codegen") {
      for (jt <- joinTypes) {
        val d = ParallelHashJoinApi.parallelHashJoin(
          part, li, Seq("p_partkey"), Seq("l_partkey"), jt)
        assert(collected(d) == golden(jt), s"results for $jt")
        assert(finalPlan(d).exists(_.isInstanceOf[ShuffledHashJoinExec]),
          s"expected ShuffledHashJoinExec (codegen impl) for $jt")
      }
    }
  }

  test("probe-preserving right_semi/right_anti stream through codegen") {
    // golden from the probe side's perspective (Spark lacks the types)
    val goldenSemi = collected(
      li.join(part, col("l_partkey") === col("p_partkey"), "left_semi"))
    val goldenAnti = collected(
      li.join(part, col("l_partkey") === col("p_partkey"), "left_anti"))
    for ((jt, expected) <- Seq("right_semi" -> goldenSemi, "right_anti" -> goldenAnti)) {
      val d = ParallelHashJoinApi.parallelHashJoin(
        part, li, Seq("p_partkey"), Seq("l_partkey"), jt)
      assert(collected(d) == expected, s"results for $jt")
      val fused = finalPlan(d).collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.exists(_.collectFirst {
        case p: ParallelHashJoinExec if p.probePreserving => p
      }.isDefined)
      assert(fused, s"expected probe-preserving $jt fused into a codegen stage")
    }
    // residual condition through the probe-preserving codegen path
    val dc = ParallelHashJoinApi.parallelHashJoin(
      part, li, Seq("p_partkey"), Seq("l_partkey"), "right_semi",
      Some(col("p_size") > 25))
    val expectedC = collected(li.join(
      part.filter(col("p_size") > 25),
      col("l_partkey") === col("p_partkey"), "left_semi"))
    assert(collected(dc) == expectedC, "right_semi with residual condition")
  }
}
