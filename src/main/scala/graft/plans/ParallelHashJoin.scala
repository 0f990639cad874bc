package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical node for the engine's first-class shared-build hash join —
  * the Spark-native re-expression of the reference's `ParallelHashJoin`
  * operator (`/root/reference/src/operator/parallel_hash_join.rs:17-168`)
  * with its 8 supported join types
  * (`/root/reference/src/operator/probe_lookup_implementation/
  * probe_lookup_implementation.rs:20-75`; right-semi/right-anti are
  * realized by side swap in the API, as Spark's JoinType lacks them).
  *
  * Only produced by [[ParallelHashJoinApi.parallelHashJoin]]; planned by
  * [[ParallelHashJoinStrategy]] into [[ParallelHashJoinExec]].
  */
/** @param probePreserving when true (only valid with LeftSemi/LeftAnti
  *   join types), the PROBE (right) side is the preserved one: probe
  *   rows stream out on first surviving match (semi) or when no match
  *   survives (anti), with no finalizer pass — the reference's
  *   right-semi/right-anti probe implementations
  *   (`/root/reference/src/operator/probe_lookup_implementation/
  *   right_semi.rs`, `right_anti.rs`), which keep the probe rows rather
  *   than bitset-marking the build side. */
case class ParallelHashJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    joinType: JoinType,
    condition: Option[Expression],
    probePreserving: Boolean = false) extends BinaryNode {

  require(ParallelHashJoin.supports(joinType), s"unsupported join type $joinType")
  require(!probePreserving || joinType == LeftSemi || joinType == LeftAnti,
    s"probePreserving only applies to semi/anti joins, not $joinType")

  override def output: Seq[Attribute] = ParallelHashJoin.outputFor(
    joinType, left.output, right.output, probePreserving)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): ParallelHashJoin =
    copy(left = newLeft, right = newRight)
}

object ParallelHashJoin {
  /** The join types the reference's probe implementations cover
    * (right-semi/anti = semi/anti with `probePreserving`), mirroring the
    * guard in `/root/reference/src/operator/use_parallel_hash_join_rule.rs:78-92`. */
  def supports(joinType: JoinType): Boolean = joinType match {
    case Inner | LeftOuter | RightOuter | FullOuter | LeftSemi | LeftAnti => true
    case _ => false
  }

  def outputFor(joinType: JoinType, leftOut: Seq[Attribute],
      rightOut: Seq[Attribute], probePreserving: Boolean = false): Seq[Attribute] =
    joinType match {
      case Inner => leftOut ++ rightOut
      case LeftOuter => leftOut ++ rightOut.map(_.withNullability(true))
      case RightOuter => leftOut.map(_.withNullability(true)) ++ rightOut
      case FullOuter => (leftOut ++ rightOut).map(_.withNullability(true))
      case LeftSemi | LeftAnti => if (probePreserving) rightOut else leftOut
      case t => throw new IllegalArgumentException(s"unsupported join type $t")
    }
}
