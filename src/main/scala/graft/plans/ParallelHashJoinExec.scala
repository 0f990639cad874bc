package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.physical._
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
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
  */
case class ParallelHashJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    joinType: JoinType,
    condition: Option[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "build side rows"))

  override def output: Seq[Attribute] =
    ParallelHashJoin.outputFor(joinType, left.output, right.output)

  /** Both sides clustered on the join keys — Spark co-partitions them
    * (the distributed analog of the reference's shared build map). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Report surviving partitioning so no redundant exchange follows
    * (SURVEY.md §7 "What's hard": the reference instead re-runs
    * EnforceDistribution after claiming RoundRobin). */
  override def outputPartitioning: Partitioning = joinType match {
    case Inner => PartitioningCollection(Seq(left.outputPartitioning, right.outputPartitioning))
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
    val buildOutput = left.output
    val probeOutput = right.output
    val buildKeys = leftKeys
    val probeKeys = rightKeys
    val jt = joinType
    val cond = condition
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (buildIter, probeIter) =>
      ParallelHashJoinExec.joinPartition(
        buildIter, probeIter, buildOutput, probeOutput, buildKeys, probeKeys,
        jt, cond, outAttrs, numOutputRows, buildRowsMetric)
    }
  }
}

object ParallelHashJoinExec {

  /** One partition's build-then-probe, mirroring the reference's
    * `execute_streaming_join` (`parallel_hash_join_executor.rs:101-121`):
    * fully consume the build side into a hash map, then stream the probe
    * side, then run the unmatched-rows finalizer. */
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
      numOutputRows: SQLMetric,
      buildRowsMetric: SQLMetric): Iterator[InternalRow] = {

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

    // --- build phase: one pass, rows buffered, non-null keys indexed.
    // Chain layout (key → head row-idx, int next[] chain): no per-row
    // boxing, no per-key buffers — the reference's index-chain map shape
    // (`concurrent_self_hash_join_map.rs` append_block) in its
    // single-writer per-partition form. ---
    val rows = new mutable.ArrayBuffer[InternalRow]()
    val keyHead = new java.util.HashMap[UnsafeRow, Integer]()
    var nextIdx = new Array[Int](1024)
    while (buildIter.hasNext) {
      val row = buildIter.next().copy()
      val idx = rows.length
      rows += row
      if (nextIdx.length <= idx) nextIdx = java.util.Arrays.copyOf(nextIdx, nextIdx.length * 2)
      val key = buildKeyProj(row)
      if (!key.anyNull) {
        val prevHead = keyHead.get(key)
        if (prevHead == null) {
          keyHead.put(key.copy(), idx)
          nextIdx(idx) = -1
        } else {
          // entry exists: HashMap keeps the stored key object, so the
          // reused projection row is safe to pass here
          keyHead.put(key, idx)
          nextIdx(idx) = prevHead.intValue()
        }
      }
    }
    buildRowsMetric += rows.length

    @inline def headFor(key: UnsafeRow): Int =
      if (key.anyNull) -1
      else {
        val h = keyHead.get(key)
        if (h == null) -1 else h.intValue()
      }

    val trackBuildMatches = joinType match {
      case LeftOuter | FullOuter | LeftSemi | LeftAnti => true
      case _ => false
    }
    val matched = if (trackBuildMatches) new java.util.BitSet(rows.length) else null
    val nullBuildRow = new GenericInternalRow(buildOutput.length)
    val nullProbeRow = new GenericInternalRow(probeOutput.length)
    val joined = new JoinedRow

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
                cursor = nextIdx(idx)
                joined(rows(idx), probeRow)
                if (boundCondition(joined)) {
                  if (markMatches) matched.set(idx)
                  return true
                }
              }
              if (!probeIter.hasNext) return false
              probeRow = probeIter.next()
              cursor = headFor(probeKeyProj(probeRow))
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
      case LeftSemi | LeftAnti =>
        // marking pass only; emits nothing (finalizer emits build rows)
        new Iterator[InternalRow] {
          override def hasNext: Boolean = {
            while (probeIter.hasNext) {
              val probeRow = probeIter.next()
              var cursor = headFor(probeKeyProj(probeRow))
              while (cursor != -1) {
                joined(rows(cursor), probeRow)
                if (boundCondition(joined)) matched.set(cursor)
                cursor = nextIdx(cursor)
              }
            }
            false
          }
          override def next(): InternalRow = throw new NoSuchElementException
        }
      case _ => // RightOuter, FullOuter: must know "any match?" per probe
        // row before padding, hence the per-row buffer + copies
        probeIter.flatMap { probeRow =>
          var cursor = headFor(probeKeyProj(probeRow))
          var anyMatch = false
          val out = new mutable.ArrayBuffer[InternalRow](4)
          while (cursor != -1) {
            joined(rows(cursor), probeRow)
            if (boundCondition(joined)) {
              anyMatch = true
              if (matched != null) matched.set(cursor)
              numOutputRows += 1
              out += resultProj(joined).copy()
            }
            cursor = nextIdx(cursor)
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
    def finisher(): Iterator[InternalRow] = joinType match {
      case LeftOuter | FullOuter =>
        Iterator.range(0, rows.length).filter(i => !matched.get(i)).map { i =>
          numOutputRows += 1
          resultProj(joined(rows(i), nullProbeRow))
        }
      case LeftSemi =>
        Iterator.range(0, rows.length).filter(matched.get).map { i =>
          numOutputRows += 1
          resultProj(rows(i))
        }
      case LeftAnti =>
        Iterator.range(0, rows.length).filter(i => !matched.get(i)).map { i =>
          numOutputRows += 1
          resultProj(rows(i))
        }
      case _ => Iterator.empty
    }

    probePhase ++ finisher()
  }
}
