package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy: [[ParallelHashJoin]] logical → physical.
  * The Spark analog of the reference's physical-optimizer rule
  * `UseParallelHashJoinRule`
  * (`/root/reference/src/operator/use_parallel_hash_join_rule.rs:20-146`);
  * matching only our explicit logical node keeps every other join on
  * Spark's built-in strategies (the rule's guard conditions are enforced
  * at node construction instead).
  *
  * `spark.graft.parallelHashJoin.impl` is the analog of the reference's
  * `JoinReplacement` version knob (`/root/reference/src/parse_sql.rs:12-24`):
  *   - `chain` (default): our interpreted chain-map exec
  *   - `codegen`: Spark's whole-stage-codegen shuffled-hash exec with a
  *     left build side — the "control" implementation, semantically
  *     identical, for A/B runs exactly as the reference's None/versionN
  *     configurations. */
object ParallelHashJoinStrategy extends SparkStrategy {
  import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight, BuildSide}
  import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
  import org.apache.spark.sql.internal.SQLConf

  val implConfKey = "spark.graft.parallelHashJoin.impl"

  /** Build-side selection for transparently-rewritten semi/anti joins
    * (`spark.graft.parallelHashJoin.sideSelect`, default true).
    *
    * The reference's rule always builds LEFT (DataFusion convention,
    * where the optimizer has already put the small side left); Spark
    * convention puts the small dim on the RIGHT, so a faithful
    * build-left `LeftSemi`/`LeftAnti` hashes the FACT side and pays a
    * bitset finalizer pass over it. The exec's probe-preserving kernel
    * (the `right_semi.rs` mechanism) is the same join with the sides
    * swapped: build the small right side, stream the fact, emit
    * matched/unmatched probe rows — identical semantics AND output
    * schema (semi/anti emit only the preserved side's columns).
    * Measured (tools/BuildSideBench, 4M fact ⋉ 100k dim): semi 1.56×
    * faster swapped (0.67× native SHJ), anti 1.09× faster swapped.
    * Applied only on the TRANSPARENT path — the explicit API keeps the
    * reference's fixed build-left — and only for equi-only semi/anti
    * where the right side's stats are ≥3× smaller (plan stability on
    * near-equal sides). */
  val sideSelectConfKey = "spark.graft.parallelHashJoin.sideSelect"

  private def swapToSmallBuild(
      jt: JoinType, cond: Option[Expression], j: Join): Boolean =
    (jt == LeftSemi || jt == LeftAnti) && cond.isEmpty &&
      SQLConf.get.getConfString(sideSelectConfKey, "true").toBoolean &&
      j.right.stats.sizeInBytes >= 0 &&
      j.right.stats.sizeInBytes * 3 <= j.left.stats.sizeInBytes

  /** Spark's supported build-side combos (HashJoin rejects e.g.
    * semi/anti with a left build): prefer BuildLeft for reference
    * fidelity, fall back to BuildRight where required. */
  private def buildSideFor(jt: JoinType): BuildSide = jt match {
    case Inner | RightOuter | FullOuter => BuildLeft
    case _ => BuildRight // LeftOuter, LeftSemi, LeftAnti
  }

  /** The `impl` knob dispatch shared by the explicit-node and the
    * transparent (auto) paths. */
  private def planJoin(
      leftKeys: Seq[Expression], rightKeys: Seq[Expression], joinType: JoinType,
      condition: Option[Expression], left: LogicalPlan, right: LogicalPlan,
      probePreserving: Boolean = false): Seq[SparkPlan] =
    SQLConf.get.getConfString(implConfKey, "chain") match {
      case "codegen" if probePreserving =>
        // control impl for probe-preserving semi/anti: Spark's own
        // LeftSemi/LeftAnti with children swapped (probe becomes the
        // preserved left side, build becomes the BuildRight hash side)
        ShuffledHashJoinExec(rightKeys, leftKeys, joinType,
          BuildRight, condition,
          planLater(right), planLater(left)) :: Nil
      case "codegen" =>
        ShuffledHashJoinExec(leftKeys, rightKeys, joinType,
          buildSideFor(joinType), condition,
          planLater(left), planLater(right)) :: Nil
      case _ =>
        ParallelHashJoinExec(leftKeys, rightKeys, joinType, condition,
          planLater(left), planLater(right), probePreserving) :: Nil
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: ParallelHashJoin =>
      planJoin(j.leftKeys, j.rightKeys, j.joinType, j.condition, j.left, j.right,
        j.probePreserving)
    // Transparent path (reference's UseParallelHashJoinRule applied to
    // ordinary SQL/DataFrame joins): conf-gated, guards in AutoParallelJoin.
    case j: Join if AutoParallelJoin.mode(SQLConf.get) != AutoParallelJoin.Off =>
      val required = AutoParallelJoin.mode(SQLConf.get) == AutoParallelJoin.Required
      AutoParallelJoin.extract(j, ignoreBroadcast = required, SQLConf.get) match {
        case Some((lk, rk, jt, cond)) if swapToSmallBuild(jt, cond, j) =>
          // build the (smaller) right side via the probe-preserving
          // kernel with swapped children — see sideSelectConfKey doc
          planJoin(rk, lk, jt, None, j.right, j.left, probePreserving = true)
        case Some((lk, rk, jt, cond)) => planJoin(lk, rk, jt, cond, j.left, j.right)
        case None => Nil
      }
    case _ => Nil
  }
}

/** User-facing API: join two DataFrames through the custom operator. */
object ParallelHashJoinApi {

  /** Install the strategy on a session (idempotent). Also usable through
    * `SparkSession.builder.withExtensions(new GraftExtensions)`. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(ParallelHashJoinStrategy))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ ParallelHashJoinStrategy
  }

  /** Join through ParallelHashJoinExec. `joinType` accepts the
    * reference's full 8-type surface — `inner, left_outer, right_outer,
    * full_outer, left_semi, left_anti, right_semi, right_anti` — with
    * the right-semi/right-anti variants realized by side swap exactly as
    * the reference's planner does. Keys are resolved by column name;
    * `condition` is an extra residual predicate (non-equi allowed). */
  def parallelHashJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeyNames: Seq[String],
      rightKeyNames: Seq[String],
      joinType: String = "inner",
      condition: Option[Column] = None): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    install(spark)

    // right_semi / right_anti: the reference implements these as
    // PROBE-preserving kernels (right_semi.rs / right_anti.rs) — the
    // build side stays the left input and probe rows stream out —
    // rather than by swapping sides into the build-preserving bitset
    // path, and so do we (also unlocks whole-stage codegen for them).
    val (jt, probePreserving) = joinType.toLowerCase match {
      case "right_semi" => (LeftSemi, true)
      case "right_anti" => (LeftAnti, true)
      case other => (JoinType(other), false)
    }
    val (lDf, rDf, lNames, rNames) = (left, right, leftKeyNames, rightKeyNames)

    val lPlan = lDf.queryExecution.analyzed
    var rPlan = rDf.queryExecution.analyzed
    // Self-join safety: re-alias the right side when attribute ids collide.
    // A residual condition cannot be disambiguated in that case (resolved
    // Columns still carry the left side's exprIds; by-name resolution is
    // ambiguous) — fail loudly instead of silently binding to the left.
    if (lPlan.outputSet.intersect(rPlan.outputSet).nonEmpty) {
      require(condition.isEmpty,
        "parallelHashJoin: residual conditions on self-joins require " +
          "pre-aliased inputs with distinct column names " +
          "(e.g. df.select(col(\"x\").as(\"left_x\")))")
      val aliases = rPlan.output.map(a =>
        Alias(a, a.name)(NamedExpression.newExprId): NamedExpression)
      rPlan = Project(aliases, rPlan)
    }

    // session-consistent (usually case-insensitive) name resolution,
    // with explicit errors for missing and ambiguous names
    val resolver = spark.sessionState.conf.resolver
    def resolve(p: LogicalPlan, name: String): Attribute =
      p.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"key column $name not in ${p.output.map(_.name).mkString(",")}")
        case many => throw new IllegalArgumentException(
          s"key column $name is ambiguous: ${many.mkString(",")}")
      }

    require(lNames.length == rNames.length && lNames.nonEmpty,
      s"parallelHashJoin needs equally many non-empty key lists, got " +
        s"${lNames.length} vs ${rNames.length}")
    val lKeys: Seq[Expression] = lNames.map(resolve(lPlan, _))
    val rKeys: Seq[Expression] = rNames.map(resolve(rPlan, _))
    lKeys.zip(rKeys).foreach { case (lk, rk) =>
      require(lk.dataType == rk.dataType,
        s"join key type mismatch: ${lk.dataType} vs ${rk.dataType} — " +
          "cast the columns to a common type first (native joins coerce; " +
          "this API is explicit)")
    }
    // Resolve the residual condition (attribute references, function
    // lookup, type coercion) by running the analyzer over a scratch
    // Filter-on-Join plan exposing both sides' attributes.
    val resolvedCond: Option[Expression] = condition.map { c =>
      val scratch = Filter(classic.GraftSqlBridge.expression(spark, c),
        Join(lPlan, rPlan, Cross, None, JoinHint.NONE))
      spark.sessionState.analyzer.execute(scratch) match {
        case f: Filter => f.condition
        case other => throw new IllegalStateException(
          s"unexpected analyzed condition plan: ${other.getClass}")
      }
    }
    val node = ParallelHashJoin(lPlan, rPlan, lKeys, rKeys, jt, resolvedCond,
      probePreserving)
    classic.GraftSqlBridge.ofRows(spark, node)
  }
}

/** `SparkSessionExtensions` hook, mirroring the reference's session
  * factory wiring (`/root/reference/src/parse_sql.rs:26-54`): the join
  * strategy plus SQL-callable registrations of the vector kernels. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.functions.{DotProduct, VectorNorm}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => ParallelHashJoinStrategy)
    e.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftFunctionsRegistry.dotBuilder))
    e.injectFunction((FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[VectorNorm].getName, "graft_norm"),
      GraftFunctionsRegistry.normBuilder))
  }
}

/** Runtime registration of the SQL functions on an existing session
  * (the non-extensions path). */
object GraftFunctionsRegistry {
  import graft.functions.{DotProduct, VectorNorm}

  private[plans] val dotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_dot expects exactly 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }
  private[plans] val normBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_norm expects exactly 1 argument, got ${exprs.length}")
    VectorNorm(exprs.head)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
    cs.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_norm", normBuilder, "built-in")
  }
}
