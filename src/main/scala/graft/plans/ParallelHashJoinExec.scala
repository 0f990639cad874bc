package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.physical._
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, GraftSpillableRowBuffer, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical shared-build hash join.
  *
  * Faithful-in-semantics, Spark-native-in-architecture rebuild of the
  * reference's operator (`/root/reference/src/operator/
  * parallel_hash_join.rs:140-167` + probe implementations): the
  * reference has all partitions cooperatively build ONE shared map
  * because it runs in a single process; under Spark's shuffle model the
  * equivalent co-location is achieved by hash-partitioning both sides on
  * the join keys (requiredChildDistribution below → EnsureRequirements
  * inserts the exchanges), after which each task builds its slice of the
  * map and streams its probe slice against it — same build-then-probe
  * barrier, same per-key co-location, but distribution-safe at 1000
  * executors instead of one process.
  *
  * Join-type mechanics mirror the reference's probe kernels:
  *  - hash lookup, then real key equality (collision guard), then the
  *    residual non-equi `condition`
  *    (`probe_lookup_implementation/inner.rs:79-129`)
  *  - build-side visited bitset + post-probe finalizer emitting
  *    unmatched build rows for outer/semi/anti
  *    (`probe_lookup_implementation/full.rs:160-201`,
  *    `concurrent_bit_set.rs`) — per-partition here, which is correct
  *    because the shuffle guarantees key-disjoint partitions.
  *  - NULL keys never match (`use_parallel_hash_join_rule.rs:87-89`),
  *    but null-keyed build rows still surface as unmatched in
  *    outer/anti results.
  *
  * Memory posture (beyond the reference, whose build map is unbounded —
  * `concurrent_self_hash_join_map.rs` grows until OOM): the per-partition
  * build buffer is byte-tracked against
  * `spark.graft.parallelHashJoin.buildSpillThreshold`; above it the
  * operator degrades to a chunked "grace" hash join — both sides land in
  * spill-capable row buffers (Spark's SMJ/Window machinery), then the
  * build side is processed one in-memory chunk at a time with the probe
  * side re-scanned per chunk, probe-unmatched tracking deferred to a
  * global pass. Same results for every join type; bounded memory.
  */
case class ParallelHashJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    joinType: JoinType,
    condition: Option[Expression],
    left: SparkPlan,
    right: SparkPlan,
    probePreserving: Boolean = false) extends BinaryExecNode with CodegenSupport {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "build side rows"),
    "buildChunks" -> SQLMetrics.createMetric(sparkContext, "build chunks (>1 = spill fallback)"))

  override def output: Seq[Attribute] =
    ParallelHashJoin.outputFor(joinType, left.output, right.output, probePreserving)

  /** Both sides clustered on the join keys — Spark co-partitions them
    * (the distributed analog of the reference's shared build map). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Report surviving partitioning so no redundant exchange follows
    * (SURVEY.md §7 "What's hard": the reference instead re-runs
    * EnforceDistribution after claiming RoundRobin). */
  override def outputPartitioning: Partitioning = joinType match {
    case Inner => PartitioningCollection(Seq(left.outputPartitioning, right.outputPartitioning))
    case LeftSemi | LeftAnti if probePreserving => right.outputPartitioning
    case LeftOuter | LeftSemi | LeftAnti => left.outputPartitioning
    case RightOuter => right.outputPartitioning
    case FullOuter => UnknownPartitioning(left.outputPartitioning.numPartitions)
    case t => throw new IllegalArgumentException(s"unsupported join type $t")
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ParallelHashJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val buildRowsMetric = longMetric("buildRows")
    val buildChunksMetric = longMetric("buildChunks")
    val buildOutput = left.output
    val probeOutput = right.output
    val buildKeys = leftKeys
    val probeKeys = rightKeys
    val jt = joinType
    val cond = condition
    val outAttrs = output
    val spillThreshold = conf.getConfString(
      ParallelHashJoinExec.spillThresholdKey,
      ParallelHashJoinExec.spillThresholdDefault).toLong
    val mapImpl = conf.getConfString(
      ParallelHashJoinExec.mapImplKey, ParallelHashJoinExec.mapImplDefault)
    left.execute().zipPartitions(right.execute()) { (buildIter, probeIter) =>
      ParallelHashJoinExec.joinPartition(
        buildIter, probeIter, buildOutput, probeOutput, buildKeys, probeKeys,
        jt, cond, outAttrs, spillThreshold, mapImpl, probePreserving,
        numOutputRows, buildRowsMetric, buildChunksMetric)
    }
  }

  // ===== whole-stage codegen (reference O3-O9's codegen'd build/probe
  // variants, realized as Spark codegen instead of Rust monomorphization;
  // the probe loop fuses into the downstream pipeline like Spark's own
  // shuffled-hash join) =====

  /** Every join type fuses into whole-stage codegen. Inner, RightOuter
    * and the probe-preserving semi/anti kernels stream row-at-a-time;
    * the build-side-finalizer types (left outer/semi/anti, full outer)
    * mark a visited bitset during the probe loop and then run a
    * re-entrant finalizer loop over the dense build-row index after the
    * probe input drains — the same produce-loop-then-finalizer shape
    * Spark's own codegen'd full-outer shuffled-hash join uses.
    *
    * The spill guarantee survives fusion: the generated build helper
    * byte-tracks against the budget and, on overrun, routes THAT
    * PARTITION to the interpreted chunked grace join at runtime (the
    * generated produce loop then just drains the fallback iterator).
    * Every other partition keeps the fused fast path — codegen and
    * bounded memory are no longer a config-time either/or. Setting
    * `codegenFallback=false` restores the old static routing: an
    * explicitly configured spill budget then disables fusion outright
    * (and, with no budget set, overruns only warn — the unbounded-build
    * posture of Spark's own codegen'd ShuffledHashJoinExec). */
  override def supportCodegen: Boolean = {
    val enabled =
      conf.getConfString(ParallelHashJoinExec.codegenEnabledKey, "true").toBoolean
    val runtimeFallback =
      conf.getConfString(ParallelHashJoinExec.codegenFallbackKey, "true").toBoolean
    enabled && (runtimeFallback || !conf.contains(ParallelHashJoinExec.spillThresholdKey))
  }

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    right.execute() :: left.execute() :: Nil

  override def needCopyResult: Boolean = true

  override protected def canCheckLimitNotReached: Boolean = true

  /** Executor-side build for the generated probe loop. Threshold is
    * baked in at codegen time (driver side) because `conf` is not
    * available on executors.
    *
    * On byte-budget overrun with `fallbackEnabled`, the partition
    * DOWNGRADES AT RUNTIME to the interpreted chunked grace join: the
    * rows buffered so far plus the remainder of the build input re-enter
    * [[ParallelHashJoinExec.joinPartition]] (which re-applies the budget
    * and takes its spill path), and the returned iterator carries the
    * complete join result for this partition — the generated produce
    * loop just drains it. Partitions that stay under budget never leave
    * the fused path. */
  def buildOrFallbackForCodegen(
      buildIter: Iterator[InternalRow],
      probeIter: Iterator[InternalRow],
      thresholdBytes: Long,
      mapImpl: String,
      fallbackEnabled: Boolean): GraftCodegenBuild = {
    val keyProj = UnsafeProjection.create(
      leftKeys.map(org.apache.spark.sql.classic.GraftSqlBridge.normalizeFloatingKey),
      left.output)
    val map = ParallelHashJoinExec.newBuildMap(mapImpl, keyProj)
    var bytes = 0L
    var warned = false
    while (buildIter.hasNext) {
      val row = buildIter.next()
      bytes += (row match {
        case u: UnsafeRow => u.getSizeInBytes.toLong
        case _ => 16L + 8L * left.output.length
      })
      if (bytes > thresholdBytes) {
        if (fallbackEnabled) {
          val rebuilt = Iterator.range(0, map.size).map(map.rowAt) ++
            Iterator.single(row.copy()) ++ buildIter
          val fallback = ParallelHashJoinExec.joinPartition(
            rebuilt, probeIter, left.output, right.output, leftKeys, rightKeys,
            joinType, condition, output, thresholdBytes, mapImpl, probePreserving,
            longMetric("numOutputRows"), longMetric("buildRows"),
            longMetric("buildChunks"))
          return new GraftCodegenBuild(null, fallback)
        } else if (!warned) {
          logWarning("parallel hash join build side exceeds " +
            s"$thresholdBytes bytes under codegen with " +
            s"${ParallelHashJoinExec.codegenFallbackKey}=false; growing " +
            "unbounded - re-enable the fallback or disable " +
            s"${ParallelHashJoinExec.codegenEnabledKey} to get the spilling path")
          warned = true
        }
      }
      map.append(row.copy())
    }
    longMetric("buildRows") += map.size
    longMetric("buildChunks") += 1
    new GraftCodegenBuild(map, null)
  }

  override protected def doProduce(ctx: CodegenContext): String = {
    val thisPlan = ctx.addReferenceObj("plan", this)
    val spillThreshold = conf.getConfString(
      ParallelHashJoinExec.spillThresholdKey,
      ParallelHashJoinExec.spillThresholdDefault).toLong
    val streamedInput = ctx.addMutableState("scala.collection.Iterator",
      "graftStreamedInput", v => s"$v = inputs[0];", forceInline = true)
    val buildInput = ctx.addMutableState("scala.collection.Iterator",
      "graftBuildInput", v => s"$v = inputs[1];", forceInline = true)
    val mapImpl = conf.getConfString(
      ParallelHashJoinExec.mapImplKey, ParallelHashJoinExec.mapImplDefault)
    val fallbackEnabled = conf.getConfString(
      ParallelHashJoinExec.codegenFallbackKey, "true").toBoolean
    val buildResTerm = ctx.addMutableState("graft.plans.GraftCodegenBuild",
      "graftBuildRes",
      v => s"$v = $thisPlan.buildOrFallbackForCodegen($buildInput, " +
        s"""$streamedInput, ${spillThreshold}L, "$mapImpl", $fallbackEnabled);""",
      forceInline = true)
    val mapTerm = ctx.addMutableState("graft.plans.GraftBuildMap", "graftChainMap",
      v => s"$v = $buildResTerm.map();", forceInline = true)
    val fbTerm = ctx.addMutableState("scala.collection.Iterator", "graftFallbackIter",
      v => s"$v = $buildResTerm.fallback();", forceInline = true)

    // evaluate the streamed (probe) columns from the input row
    val streamedRow = ctx.freshName("graftStreamedRow")
    ctx.INPUT_ROW = streamedRow
    ctx.currentVars = null
    val streamVars = right.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val streamEval = evaluateVariables(streamVars)

    // probe key as an UnsafeRow (same float normalization as the map)
    ctx.currentVars = streamVars
    val keyExprs = rightKeys
      .map(org.apache.spark.sql.classic.GraftSqlBridge.normalizeFloatingKey)
      .map(BindReferences.bindReference(_, right.output))
    val keyEv = GenerateUnsafeProjection.createCode(ctx, keyExprs)

    val numOutput = metricTerm(ctx, "numOutputRows")
    val idxTerm = ctx.freshName("graftIdx")
    val buildRow = ctx.freshName("graftBuildRow")

    // Build-finalizer machinery (left outer/semi/anti, full outer):
    // a visited bit per dense build-row index, marked in the probe
    // loop, plus a re-entrant cursor for the post-probe emit loop.
    val needsFinalizer = joinType match {
      case LeftSemi | LeftAnti if probePreserving => false
      case LeftOuter | FullOuter | LeftSemi | LeftAnti => true
      case _ => false
    }
    val visitedTerm = if (needsFinalizer)
      ctx.addMutableState("java.util.BitSet", "graftVisited",
        v => s"$v = new java.util.BitSet();", forceInline = true)
    else ""
    val finIdxTerm = if (needsFinalizer)
      ctx.addMutableState(org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.JAVA_INT,
        "graftFinIdx", v => s"$v = 0;", forceInline = true)
    else ""

    /** Build-side column ExprCodes bound to `row` (fresh scope). */
    def buildVarsFor(row: String): (Seq[ExprCode], String) = {
      ctx.INPUT_ROW = row
      ctx.currentVars = null
      val vars = left.output.zipWithIndex.map { case (a, i) =>
        BoundReference(i, a.dataType, a.nullable).genCode(ctx)
      }
      (vars, evaluateVariables(vars))
    }

    /** Residual-condition guard over `buildVars ++ streamVars`:
      * (open, close) code wrapping the emit/mark site. The hash lookup
      * already guarantees key equality via UnsafeRow equals. */
    def condGuard(buildVars: Seq[ExprCode]): (String, String) =
      condition.map { c =>
        ctx.currentVars = buildVars ++ streamVars
        ctx.INPUT_ROW = null
        val bound = BindReferences.bindReference(c, AttributeSeq(left.output ++ right.output))
        val ev = bound.genCode(ctx)
        (s"""
            |${ev.code}
            |if (!${ev.isNull} && ${ev.value}) {""".stripMargin, "}")
      }.getOrElse(("", ""))

    /** Null-guarded build vars for pad-capable loops: `row` may be the
      * Java literal null, in which case every column reads as NULL
      * (Spark's codegenOuter shape). */
    def paddedBuildVarsFor(row: String): (Seq[ExprCode], String) = {
      ctx.INPUT_ROW = row
      ctx.currentVars = null
      val vars = left.output.zipWithIndex.map { case (a, i) =>
        val ev = BoundReference(i, a.dataType, a.nullable).genCode(ctx)
        val isNull = ctx.freshName("graftIsNull")
        val value = ctx.freshName("graftValue")
        import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        val javaType = CodeGenerator.javaType(a.dataType)
        val newCode =
          s"""
             |boolean $isNull = true;
             |$javaType $value = ${CodeGenerator.defaultValue(a.dataType)};
             |if ($row != null) {
             |  ${ev.code}
             |  $isNull = ${ev.isNull};
             |  $value = ${ev.value};
             |}
           """.stripMargin
        import org.apache.spark.sql.catalyst.expressions.codegen.{Block, JavaCode}
        import Block._
        ExprCode(code"$newCode",
          JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
      }
      (vars, evaluateVariables(vars))
    }

    /** Residual condition as a boolean `passed` var for pad-capable
      * loops: a null build row (the pad iteration) always passes. */
    def condPassed(buildVars: Seq[ExprCode], row: String, passed: String): String =
      condition.map { c =>
        ctx.currentVars = buildVars ++ streamVars
        ctx.INPUT_ROW = null
        val bound = BindReferences.bindReference(c, AttributeSeq(left.output ++ right.output))
        val ev = bound.genCode(ctx)
        s"""
           |boolean $passed = true;
           |if ($row != null) {
           |  ${ev.code}
           |  $passed = !${ev.isNull} && ${ev.value};
           |}
         """.stripMargin
      }.getOrElse(s"boolean $passed = true;")

    val body = joinType match {
      case Inner | LeftOuter =>
        // inner-style emit of surviving matches; LeftOuter additionally
        // marks visited build rows so the finalizer below can pad the
        // unmatched remainder
        val (buildVars, buildEval) = buildVarsFor(buildRow)
        val (condOpen, condClose) = condGuard(buildVars)
        val curIdx = ctx.freshName("graftCurIdx")
        val mark = if (joinType == LeftOuter) s"$visitedTerm.set($curIdx);" else ""
        val consumeCode = consume(ctx, buildVars ++ streamVars)
        s"""
           |${keyEv.code}
           |if (!${keyEv.value}.anyNull()) {
           |  int $idxTerm = $mapTerm.headFor(${keyEv.value});
           |  while ($idxTerm != -1) {
           |    int $curIdx = $idxTerm;
           |    InternalRow $buildRow = $mapTerm.rowAt($idxTerm);
           |    $idxTerm = $mapTerm.next($idxTerm);
           |    $buildEval
           |    $condOpen
           |    $mark
           |    $numOutput.add(1);
           |    $consumeCode
           |    $condClose
           |  }
           |}
         """.stripMargin

      case RightOuter | FullOuter =>
        // Spark's codegenOuter shape: the loop's final iteration emits
        // the null-padded row when no match survived the condition.
        // FullOuter additionally marks visited build rows for the
        // finalizer below.
        val (buildVars, buildEval) = paddedBuildVarsFor(buildRow)
        val passed = ctx.freshName("graftPassed")
        val condEval = condPassed(buildVars, buildRow, passed)
        val found = ctx.freshName("graftFound")
        val curIdx = ctx.freshName("graftCurIdx")
        val mark = if (joinType == FullOuter)
          s"if ($curIdx != -1) $visitedTerm.set($curIdx);" else ""
        val consumeCode = consume(ctx, buildVars ++ streamVars)
        s"""
           |${keyEv.code}
           |int $idxTerm = ${keyEv.value}.anyNull() ? -1 : $mapTerm.headFor(${keyEv.value});
           |boolean $found = false;
           |// last iteration pads with nulls when no match survived
           |while ($idxTerm != -1 || !$found) {
           |  int $curIdx = $idxTerm;
           |  InternalRow $buildRow = $idxTerm != -1 ? $mapTerm.rowAt($idxTerm) : null;
           |  if ($idxTerm != -1) $idxTerm = $mapTerm.next($idxTerm);
           |  $buildEval
           |  $condEval
           |  if ($passed) {
           |    $found = true;
           |    $mark
           |    $numOutput.add(1);
           |    $consumeCode
           |  }
           |}
         """.stripMargin

      case LeftSemi | LeftAnti if probePreserving =>
        // probe-preserving semi/anti: stream probe rows; the build side
        // is only touched to find one surviving match
        val (buildVars, buildEval) = buildVarsFor(buildRow)
        val (condOpen, condClose) = condGuard(buildVars)
        val found = ctx.freshName("graftFound")
        val emitWhen = if (joinType == LeftSemi) found else s"!$found"
        val consumeCode = consume(ctx, streamVars)
        s"""
           |${keyEv.code}
           |boolean $found = false;
           |if (!${keyEv.value}.anyNull()) {
           |  int $idxTerm = $mapTerm.headFor(${keyEv.value});
           |  while ($idxTerm != -1 && !$found) {
           |    InternalRow $buildRow = $mapTerm.rowAt($idxTerm);
           |    $idxTerm = $mapTerm.next($idxTerm);
           |    $buildEval
           |    $condOpen
           |    $found = true;
           |    $condClose
           |  }
           |}
           |if ($emitWhen) {
           |  $numOutput.add(1);
           |  $consumeCode
           |}
         """.stripMargin

      case LeftSemi | LeftAnti =>
        // build-preserving semi/anti: the probe loop only MARKS build
        // rows whose residual survives (skipping already-visited ones);
        // all emission happens in the finalizer loop below
        val (buildVars, buildEval) = buildVarsFor(buildRow)
        val (condOpen, condClose) = condGuard(buildVars)
        val curIdx = ctx.freshName("graftCurIdx")
        s"""
           |${keyEv.code}
           |if (!${keyEv.value}.anyNull()) {
           |  int $idxTerm = $mapTerm.headFor(${keyEv.value});
           |  while ($idxTerm != -1) {
           |    int $curIdx = $idxTerm;
           |    InternalRow $buildRow = $mapTerm.rowAt($idxTerm);
           |    $idxTerm = $mapTerm.next($idxTerm);
           |    if (!$visitedTerm.get($curIdx)) {
           |      $buildEval
           |      $condOpen
           |      $visitedTerm.set($curIdx);
           |      $condClose
           |    }
           |  }
           |}
         """.stripMargin

      case t => throw new IllegalStateException(s"codegen unsupported for $t")
    }

    // Post-probe finalizer: walk the dense build-row index and emit the
    // rows the probe loop marked (semi) or left unmarked (outer/anti),
    // null-padding the probe side for the outer types. Re-entrant: the
    // cursor is codegen mutable state, so processNext re-entry after a
    // full output batch resumes exactly where it stopped.
    val finalizer = if (!needsFinalizer) "" else {
      val finRow = ctx.freshName("graftFinRow")
      val (finVars, finEval) = buildVarsFor(finRow)
      val emitTerm = ctx.freshName("graftEmit")
      val emitCond = joinType match {
        case LeftSemi => s"$visitedTerm.get($finIdxTerm)"
        case _ => s"!$visitedTerm.get($finIdxTerm)"
      }
      val finConsume = joinType match {
        case LeftSemi | LeftAnti => consume(ctx, finVars)
        case _ =>
          val nullProbe = right.output.map(a => ExprCode.forNullValue(a.dataType))
          consume(ctx, finVars ++ nullProbe)
      }
      s"""
         |while ($limitNotReachedCond $finIdxTerm < $mapTerm.size()) {
         |  boolean $emitTerm = $emitCond;
         |  InternalRow $finRow = $mapTerm.rowAt($finIdxTerm);
         |  $finIdxTerm++;
         |  if ($emitTerm) {
         |    $finEval
         |    $numOutput.add(1);
         |    $finConsume
         |  }
         |  if (shouldStop()) return;
         |}
       """.stripMargin
    }

    // Runtime-fallback drain: when the build helper detected a budget
    // overrun it returned the interpreted grace join's result iterator
    // instead of a map — output rows are complete join rows, consumed
    // row-wise (joinPartition already counted them in numOutputRows).
    val fbRow = ctx.freshName("graftFbRow")
    ctx.INPUT_ROW = fbRow
    ctx.currentVars = null
    val fbConsume = consume(ctx, null, fbRow)
    s"""
       |if ($fbTerm != null) {
       |  while ($limitNotReachedCond $fbTerm.hasNext()) {
       |    InternalRow $fbRow = (InternalRow) $fbTerm.next();
       |    $fbConsume
       |    if (shouldStop()) return;
       |  }
       |} else {
       |  while ($limitNotReachedCond $streamedInput.hasNext()) {
       |    InternalRow $streamedRow = (InternalRow) $streamedInput.next();
       |    $streamEval
       |    $body
       |    if (shouldStop()) return;
       |  }
       |  $finalizer
       |}
     """.stripMargin
  }
}

/** Result of the codegen build phase: exactly one of `map` (under
  * budget — fused probe loop proceeds) or `fallback` (over budget — the
  * complete interpreted grace-join result for this partition) is
  * non-null. Plain class with Java-callable accessors because the
  * generated code references it directly. */
final class GraftCodegenBuild(
    val map: GraftBuildMap,
    val fallback: Iterator[InternalRow])

object ParallelHashJoinExec {

  /** Per-partition build-side byte budget before the chunked spill
    * fallback engages. 256 MB default: at 32 shuffle partitions that
    * bounds resident build state well under executor memory, and at
    * cluster scale the budget is per-task regardless of input size. */
  val spillThresholdKey = "spark.graft.parallelHashJoin.buildSpillThreshold"
  val spillThresholdDefault: String = (256L * 1024 * 1024).toString

  /** Gate for the whole-stage-codegen inner-join path (`false` falls
    * back to the interpreted, spill-capable doExecute). */
  val codegenEnabledKey = "spark.graft.parallelHashJoin.codegenEnabled"

  /** Runtime spill fallback under codegen (default on): a partition
    * whose build side overruns the byte budget downgrades to the
    * interpreted chunked grace join mid-task while every other
    * partition keeps the fused path. `false` restores the static
    * routing where an explicitly configured budget disables fusion
    * (see [[ParallelHashJoinExec.supportCodegen]]). */
  val codegenFallbackKey = "spark.graft.parallelHashJoin.codegenFallback"

  /** Build-map layout knob — the analog of the reference's build-side
    * version1..10 A/B family for the map itself: `chain` (boxed
    * HashMap of key → chain head, version1's shape) or `open`
    * (open-addressing slot table, version10's shape — see
    * `GraftOpenMap`). Orthogonal to the `impl` exec knob. */
  val mapImplKey = "spark.graft.parallelHashJoin.map"
  val mapImplDefault = "chain"

  private[plans] def newBuildMap(impl: String, keyProj: UnsafeProjection): GraftBuildMap =
    impl match {
      case "open" => new GraftOpenMap(keyProj)
      case _ => new GraftChainMap(keyProj)
    }

  /** One partition's build-then-probe, mirroring the reference's
    * `execute_streaming_join` (`parallel_hash_join_executor.rs:101-121`):
    * fully consume the build side into a hash map, then stream the probe
    * side, then run the unmatched-rows finalizer. Above the byte budget
    * the same contract runs chunk-by-chunk (see class doc). */
  // noinspection ScalaStyle
  private[plans] def joinPartition(
      buildIter: Iterator[InternalRow],
      probeIter: Iterator[InternalRow],
      buildOutput: Seq[Attribute],
      probeOutput: Seq[Attribute],
      buildKeys: Seq[Expression],
      probeKeys: Seq[Expression],
      joinType: JoinType,
      condition: Option[Expression],
      outAttrs: Seq[Attribute],
      spillThresholdBytes: Long,
      mapImpl: String,
      probePreserving: Boolean,
      numOutputRows: SQLMetric,
      buildRowsMetric: SQLMetric,
      buildChunksMetric: SQLMetric): Iterator[InternalRow] = {

    // Normalize float/double keys (-0.0 → 0.0, canonical NaN) exactly as
    // Spark's NormalizeFloatingNumbers does for native joins — our map
    // compares raw UnsafeRow bytes, so un-normalized ±0.0 would fail to
    // match where df.join matches it.
    val normBuildKeys = buildKeys.map(
      org.apache.spark.sql.classic.GraftSqlBridge.normalizeFloatingKey)
    val normProbeKeys = probeKeys.map(
      org.apache.spark.sql.classic.GraftSqlBridge.normalizeFloatingKey)
    val buildKeyProj = UnsafeProjection.create(normBuildKeys, buildOutput)
    val probeKeyProj = UnsafeProjection.create(normProbeKeys, probeOutput)
    // Null-padding makes the padded side's columns nullable even when the
    // child schema says otherwise — the output projection MUST bind
    // against nullability-adjusted attributes, or codegen elides the
    // null check and reads 0 from the all-null pad row.
    val buildOutForRead = joinType match {
      case RightOuter | FullOuter => buildOutput.map(_.withNullability(true))
      case _ => buildOutput
    }
    val probeOutForRead = joinType match {
      case LeftOuter | FullOuter => probeOutput.map(_.withNullability(true))
      case _ => probeOutput
    }
    val joinedOutput = buildOutForRead ++ probeOutForRead
    val resultProj: UnsafeProjection = joinType match {
      case LeftSemi | LeftAnti if probePreserving =>
        UnsafeProjection.create(outAttrs, probeOutput)
      case LeftSemi | LeftAnti => UnsafeProjection.create(outAttrs, buildOutput)
      case _ => UnsafeProjection.create(outAttrs, joinedOutput)
    }
    val boundCondition: InternalRow => Boolean = condition match {
      case Some(c) =>
        val pred = Predicate.create(c, joinedOutput)
        // partition-aware init so nondeterministic conditions (rand())
        // draw independent streams per partition, as native joins do
        pred.initialize(Option(org.apache.spark.TaskContext.get())
          .map(_.partitionId()).getOrElse(0))
        pred.eval _
      case None => (_: InternalRow) => true
    }

    val chain: GraftBuildMap = newBuildMap(mapImpl, buildKeyProj)
    val trackBuildMatches = joinType match {
      case LeftSemi | LeftAnti if probePreserving => false
      case LeftOuter | FullOuter | LeftSemi | LeftAnti => true
      case _ => false
    }
    val nullBuildRow = new GenericInternalRow(buildOutput.length)
    val nullProbeRow = new GenericInternalRow(probeOutput.length)
    val joined = new JoinedRow

    // --- build phase: one pass, rows buffered, non-null keys indexed,
    // bytes tracked against the spill budget ---
    val toUnsafeBuild = UnsafeProjection.create(buildOutput.map(_.dataType).toArray)
    def asUnsafe(r: InternalRow, proj: UnsafeProjection): UnsafeRow = r match {
      case u: UnsafeRow => u
      case other => proj(other)
    }
    var buildBytes = 0L
    var buildStore: GraftSpillableRowBuffer = null
    while (buildIter.hasNext && buildStore == null) {
      val row = buildIter.next()
      buildBytes += (row match {
        case u: UnsafeRow => u.getSizeInBytes.toLong
        case _ => 16L + 8L * buildOutput.length
      })
      if (buildBytes > spillThresholdBytes) {
        // over budget: migrate what's buffered into a spill-capable store
        // and keep consuming there — the chunked path takes over below
        buildStore = new GraftSpillableRowBuffer()
        var i = 0
        while (i < chain.size) {
          buildStore.add(asUnsafe(chain.rowAt(i), toUnsafeBuild))
          i += 1
        }
        chain.clear()
        buildStore.add(asUnsafe(row, toUnsafeBuild))
      } else {
        chain.append(row.copy())
      }
    }
    if (buildStore != null) {
      while (buildIter.hasNext) buildStore.add(asUnsafe(buildIter.next(), toUnsafeBuild))
      buildRowsMetric += buildStore.length
    } else {
      buildRowsMetric += chain.size
    }

    /** Unmatched/matched build-row emitters shared by both paths; the
      * bitset covers exactly the rows currently resident in `chain`. */
    def buildFinisher(matched: java.util.BitSet): Iterator[InternalRow] = joinType match {
      case LeftSemi | LeftAnti if probePreserving => Iterator.empty
      case LeftOuter | FullOuter =>
        Iterator.range(0, chain.size).filter(i => !matched.get(i)).map { i =>
          numOutputRows += 1
          resultProj(joined(chain.rowAt(i), nullProbeRow))
        }
      case LeftSemi =>
        Iterator.range(0, chain.size).filter(matched.get).map { i =>
          numOutputRows += 1
          resultProj(chain.rowAt(i))
        }
      case LeftAnti =>
        Iterator.range(0, chain.size).filter(i => !matched.get(i)).map { i =>
          numOutputRows += 1
          resultProj(chain.rowAt(i))
        }
      case _ => Iterator.empty
    }

    if (buildStore == null) {
      // ===== fast path: whole build side resident in one chain map =====
      buildChunksMetric += 1
      val matched = if (trackBuildMatches) new java.util.BitSet(chain.size) else null

      // --- probe phase: streamed ---
      // Inner: fully lazy, zero-copy (projection rows are consumed before
      // the next element is produced — standard SparkPlan iterator
      // contract). Semi/anti: allocation-free marking pass, no output.
      // Outer paths buffer per-probe-row matches (they must know whether
      // any match survived the condition before padding), so they copy.
      val probePhase: Iterator[InternalRow] = joinType match {
        case Inner | LeftOuter =>
          // fully lazy, zero-copy; LeftOuter additionally marks matched
          // build rows for the finalizer (unmatched PROBE rows are never
          // emitted for these types, so no per-probe buffering is needed)
          val markMatches = joinType == LeftOuter
          new Iterator[InternalRow] {
            private var probeRow: InternalRow = _
            private var cursor: Int = -1
            private var pending = false

            private def advance(): Boolean = {
              while (true) {
                while (cursor != -1) {
                  val idx = cursor
                  cursor = chain.next(idx)
                  joined(chain.rowAt(idx), probeRow)
                  if (boundCondition(joined)) {
                    if (markMatches) matched.set(idx)
                    return true
                  }
                }
                if (!probeIter.hasNext) return false
                probeRow = probeIter.next()
                cursor = chain.headFor(probeKeyProj(probeRow))
              }
              false
            }

            override def hasNext: Boolean = pending || { pending = advance(); pending }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              pending = false
              numOutputRows += 1
              resultProj(joined)
            }
          }
        case LeftSemi | LeftAnti if probePreserving =>
          // probe-preserving semi/anti (reference right_semi.rs /
          // right_anti.rs): stream probe rows, emit on first surviving
          // match (semi) / on none (anti) — no bitset, no finalizer
          val emitOnMatch = joinType == LeftSemi
          new Iterator[InternalRow] {
            private var pendingRow: InternalRow = _
            private def advance(): InternalRow = {
              while (probeIter.hasNext) {
                val probeRow = probeIter.next()
                var cursor = chain.headFor(probeKeyProj(probeRow))
                var found = false
                while (cursor != -1 && !found) {
                  joined(chain.rowAt(cursor), probeRow)
                  if (boundCondition(joined)) found = true
                  cursor = chain.next(cursor)
                }
                if (found == emitOnMatch) return probeRow
              }
              null
            }
            override def hasNext: Boolean =
              pendingRow != null || { pendingRow = advance(); pendingRow != null }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              val r = pendingRow
              pendingRow = null
              numOutputRows += 1
              resultProj(r)
            }
          }
        case LeftSemi | LeftAnti =>
          // marking pass only; emits nothing (finalizer emits build rows)
          new Iterator[InternalRow] {
            override def hasNext: Boolean = {
              while (probeIter.hasNext) {
                val probeRow = probeIter.next()
                var cursor = chain.headFor(probeKeyProj(probeRow))
                while (cursor != -1) {
                  joined(chain.rowAt(cursor), probeRow)
                  if (boundCondition(joined)) matched.set(cursor)
                  cursor = chain.next(cursor)
                }
              }
              false
            }
            override def next(): InternalRow = throw new NoSuchElementException
          }
        case _ => // RightOuter, FullOuter: must know "any match?" per probe
          // row before padding, hence the per-row buffer + copies
          probeIter.flatMap { probeRow =>
            var cursor = chain.headFor(probeKeyProj(probeRow))
            var anyMatch = false
            val out = new mutable.ArrayBuffer[InternalRow](4)
            while (cursor != -1) {
              joined(chain.rowAt(cursor), probeRow)
              if (boundCondition(joined)) {
                anyMatch = true
                if (matched != null) matched.set(cursor)
                numOutputRows += 1
                out += resultProj(joined).copy()
              }
              cursor = chain.next(cursor)
            }
            if (!anyMatch) {
              numOutputRows += 1
              out += resultProj(joined(nullBuildRow, probeRow)).copy()
            }
            out
          }
      }

      // --- finalizer: unmatched build rows (runs once probe is drained),
      // the per-partition analog of the reference's last-owner finalizer ---
      probePhase ++ buildFinisher(matched)
    } else {
      // ===== chunked fallback ("grace" hash join) =====
      // Build side exceeds the byte budget: process it one chunk at a
      // time, re-scanning the (spill-buffered) probe side per chunk.
      // Build-row match state is chunk-local (chunks are disjoint);
      // probe-row match state spans chunks, so RightOuter/FullOuter
      // padding runs in one global pass at the end.
      val toUnsafeProbe = UnsafeProjection.create(probeOutput.map(_.dataType).toArray)
      val probeStore = new GraftSpillableRowBuffer()
      while (probeIter.hasNext) probeStore.add(asUnsafe(probeIter.next(), toUnsafeProbe))

      val probeMatched = joinType match {
        case RightOuter | FullOuter => new java.util.BitSet(probeStore.length)
        case LeftSemi | LeftAnti if probePreserving =>
          new java.util.BitSet(probeStore.length)
        case _ => null
      }
      val buildStoreIter = buildStore.iterator
      var chunkMatched: java.util.BitSet = null

      def loadChunk(): Boolean = {
        if (!buildStoreIter.hasNext) return false
        chain.clear()
        var chunkBytes = 0L
        while (buildStoreIter.hasNext && chunkBytes < spillThresholdBytes) {
          val r = buildStoreIter.next()
          chunkBytes += r.getSizeInBytes
          chain.append(r.copy()) // store iterator reuses its row buffer
        }
        chunkMatched = if (trackBuildMatches) new java.util.BitSet(chain.size) else null
        buildChunksMetric += 1
        true
      }

      def probeChunk(): Iterator[InternalRow] = joinType match {
        case LeftSemi | LeftAnti if probePreserving =>
          // mark probe rows with a surviving match; the global pass
          // emits them by bit (semi: set, anti: unset)
          new Iterator[InternalRow] {
            private val pIter = probeStore.iterator
            private var pIdx = -1
            override def hasNext: Boolean = {
              while (pIter.hasNext) {
                val probeRow = pIter.next()
                pIdx += 1
                if (!probeMatched.get(pIdx)) {
                  var cursor = chain.headFor(probeKeyProj(probeRow))
                  var found = false
                  while (cursor != -1 && !found) {
                    joined(chain.rowAt(cursor), probeRow)
                    if (boundCondition(joined)) found = true
                    cursor = chain.next(cursor)
                  }
                  if (found) probeMatched.set(pIdx)
                }
              }
              false
            }
            override def next(): InternalRow = throw new NoSuchElementException
          }
        case LeftSemi | LeftAnti =>
          // marking pass only, as in the fast path
          new Iterator[InternalRow] {
            private val pIter = probeStore.iterator
            override def hasNext: Boolean = {
              while (pIter.hasNext) {
                val probeRow = pIter.next()
                var cursor = chain.headFor(probeKeyProj(probeRow))
                while (cursor != -1) {
                  joined(chain.rowAt(cursor), probeRow)
                  if (boundCondition(joined)) chunkMatched.set(cursor)
                  cursor = chain.next(cursor)
                }
              }
              false
            }
            override def next(): InternalRow = throw new NoSuchElementException
          }
        case _ =>
          // Inner/LeftOuter/RightOuter/FullOuter all emit matches lazily;
          // probe padding is deferred to the global pass, so unlike the
          // fast path RightOuter/FullOuter need no per-row buffering here.
          val markBuild = trackBuildMatches
          new Iterator[InternalRow] {
            private val pIter = probeStore.iterator
            private var pIdx = -1
            private var probeRow: InternalRow = _
            private var cursor: Int = -1
            private var pending = false

            private def advance(): Boolean = {
              while (true) {
                while (cursor != -1) {
                  val idx = cursor
                  cursor = chain.next(idx)
                  joined(chain.rowAt(idx), probeRow)
                  if (boundCondition(joined)) {
                    if (markBuild) chunkMatched.set(idx)
                    if (probeMatched != null) probeMatched.set(pIdx)
                    return true
                  }
                }
                if (!pIter.hasNext) return false
                probeRow = pIter.next()
                pIdx += 1
                cursor = chain.headFor(probeKeyProj(probeRow))
              }
              false
            }

            override def hasNext: Boolean = pending || { pending = advance(); pending }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              pending = false
              numOutputRows += 1
              resultProj(joined)
            }
          }
      }

      def globalFinisher(): Iterator[InternalRow] = joinType match {
        case LeftSemi | LeftAnti if probePreserving =>
          val emitOnMatch = joinType == LeftSemi
          val pIter = probeStore.iterator
          var pIdx = -1
          pIter.filter { _ =>
            pIdx += 1; probeMatched.get(pIdx) == emitOnMatch
          }.map { probeRow =>
            numOutputRows += 1
            resultProj(probeRow)
          }
        case RightOuter | FullOuter =>
          val pIter = probeStore.iterator
          var pIdx = -1
          pIter.filter { _ => pIdx += 1; !probeMatched.get(pIdx) }.map { probeRow =>
            numOutputRows += 1
            resultProj(joined(nullBuildRow, probeRow))
          }
        case _ => Iterator.empty
      }

      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        private var globalDone = false

        @annotation.tailrec
        override def hasNext: Boolean =
          cur.hasNext || {
            if (globalDone) false
            else if (loadChunk()) {
              // chunkFinisher is evaluated lazily, after the probe pass
              // has populated chunkMatched (Iterator.++ is by-name)
              cur = probeChunk() ++ buildFinisher(chunkMatched)
              hasNext
            } else {
              globalDone = true
              cur = globalFinisher()
              cur.hasNext
            }
          }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          cur.next()
        }
      }
    }
  }
}
