package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftSqlBridge
import org.apache.spark.sql.types._

/** `collect_list` with a hard cap on aggregation-buffer size: collects
  * up to `cap` long values per group and returns NULL for any group
  * whose true cardinality exceeds the cap.
  *
  * This is the memory-safe building block for document-frequency-capped
  * inverted indexes (`t8_ngram_jaccard`): the capped posting lists ARE
  * the output, and keys over the cap are dropped anyway, so there is no
  * reason to ever buffer them — a mega-hot stop-shingle appearing in
  * 10M documents costs O(cap) state in one task instead of a 10M-element
  * `collect_list` array (the classic blocked-join skew tail;
  * the reference's skew story is `benches/exponential_distribution.rs`).
  * Unlike the pre-count + semi-join formulation, this needs ONE shuffle
  * and no join of the full (doc, shingle) table — measured ~6x faster
  * at sf0.1 with identical results.
  *
  * Buffer stores at most `cap` values plus a saturating true count;
  * merge concatenates up to the cap, so a group whose final count is
  * ≤ cap is never truncated (its list is exact, in arbitrary order —
  * callers must be order-insensitive, as the min/max pair expansion in
  * t8 is). NULL inputs are skipped, matching `collect_list`.
  */
case class CappedLongCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongCollectList.Buf] {

  require(cap > 0, "cap must be positive")

  override def prettyName: String = "graft_capped_collect_list"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT column, got $other")
  }

  override def createAggregationBuffer(): CappedLongCollectList.Buf =
    new CappedLongCollectList.Buf(new Array[Long](math.min(cap, 16)), 0)

  override def update(
      buf: CappedLongCollectList.Buf, input: InternalRow): CappedLongCollectList.Buf = {
    val v = child.eval(input)
    if (v != null) buf.append(v.asInstanceOf[Long], cap)
    buf
  }

  override def merge(
      buf: CappedLongCollectList.Buf,
      other: CappedLongCollectList.Buf): CappedLongCollectList.Buf = {
    var i = 0
    val keep = math.min(other.n, cap) // stored values (n may be saturated past cap)
    while (i < keep) { buf.append(other.values(i), cap); i += 1 }
    if (other.n > cap) buf.n = cap + 1 // propagate overflow even if keep fit
    buf
  }

  override def eval(buf: CappedLongCollectList.Buf): Any =
    if (buf.n > cap) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.values, buf.n))

  override def serialize(buf: CappedLongCollectList.Buf): Array[Byte] = {
    val stored = math.min(buf.n, cap)
    val bb = ByteBuffer.allocate(4 + 8 * stored)
    bb.putInt(buf.n)
    var i = 0
    while (i < stored) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongCollectList.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val stored = math.min(n, cap)
    val arr = new Array[Long](math.max(stored, 1))
    var i = 0
    while (i < stored) { arr(i) = bb.getLong; i += 1 }
    new CappedLongCollectList.Buf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedLongCollectList =
    copy(child = newChildren.head)
}

object CappedLongCollectList {

  /** Growable long buffer with a saturating count: values beyond the
    * cap are never stored, `n` just saturates at cap+1 to mark
    * overflow. */
  final class Buf(var values: Array[Long], var n: Int) {
    def append(v: Long, cap: Int): Unit = {
      if (n < cap) {
        if (n == values.length)
          values = java.util.Arrays.copyOf(values, math.min(values.length * 2, cap))
        values(n) = v
        n += 1
      } else {
        n = cap + 1 // saturate: group exceeds the cap, list will be null
      }
    }
  }

  /** Column API: `cappedCollectList(col, 100)` — exact list for groups
    * of ≤ cap values, NULL otherwise. */
  def cappedCollectList(c: Column, cap: Int)(
      implicit spark: org.apache.spark.sql.SparkSession): Column =
    GraftSqlBridge.column(
      CappedLongCollectList(GraftSqlBridge.expression(spark, c), cap)
        .toAggregateExpression())
}

/** `collect_set` with the same hard cap discipline as
  * [[CappedLongCollectList]]: collects up to `cap` DISTINCT long values
  * per group and returns NULL for any group whose true distinct
  * cardinality exceeds the cap.
  *
  * Built for the one-shuffle co-occurrence pair build
  * ([[graft.operators.Graph.coOccurrence]]): the group's distinct item
  * set IS the output, and over-cap groups are dropped anyway, so a
  * degenerate mega-group (crawler-trap basket) costs O(cap) buffer
  * state — and, once saturated, O(1) per further row — instead of an
  * unbounded `collect_set` array. Membership is a linear scan of the
  * ≤cap buffer: exact, allocation-free, and trivially cheap at basket
  * scale (the production cap is 1024).
  *
  * Same contracts as the list variant: NULL inputs skipped; merge
  * unions up to the cap and propagates saturation; a group whose true
  * distinct count is ≤ cap gets its exact set in arbitrary order —
  * callers must be order-insensitive (the pair expansion's
  * least/greatest is). */
case class CappedLongCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongCollectList.Buf] {

  require(cap > 0, "cap must be positive")

  override def prettyName: String = "graft_capped_collect_set"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT column, got $other")
  }

  override def createAggregationBuffer(): CappedLongCollectList.Buf =
    new CappedLongCollectList.Buf(new Array[Long](math.min(cap, 16)), 0)

  private def appendDistinct(buf: CappedLongCollectList.Buf, v: Long): Unit = {
    if (buf.n > cap) return // saturated: nothing can change the NULL verdict
    var i = 0
    while (i < buf.n) { if (buf.values(i) == v) return; i += 1 }
    buf.append(v, cap) // absent: append (saturates n to cap+1 if full)
  }

  override def update(
      buf: CappedLongCollectList.Buf, input: InternalRow): CappedLongCollectList.Buf = {
    val v = child.eval(input)
    if (v != null) appendDistinct(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: CappedLongCollectList.Buf,
      other: CappedLongCollectList.Buf): CappedLongCollectList.Buf = {
    var i = 0
    val keep = math.min(other.n, cap)
    while (i < keep) { appendDistinct(buf, other.values(i)); i += 1 }
    if (other.n > cap) buf.n = cap + 1 // other side saw > cap distinct values
    buf
  }

  override def eval(buf: CappedLongCollectList.Buf): Any =
    if (buf.n > cap) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.values, buf.n))

  override def serialize(buf: CappedLongCollectList.Buf): Array[Byte] = {
    val stored = math.min(buf.n, cap)
    val bb = ByteBuffer.allocate(4 + 8 * stored)
    bb.putInt(buf.n)
    var i = 0
    while (i < stored) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongCollectList.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val stored = math.min(n, cap)
    val arr = new Array[Long](math.max(stored, 1))
    var i = 0
    while (i < stored) { arr(i) = bb.getLong; i += 1 }
    new CappedLongCollectList.Buf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedLongCollectSet =
    copy(child = newChildren.head)
}

object CappedLongCollectSet {
  /** Column API: `cappedCollectSet(col, 1024)` — exact distinct set for
    * groups of ≤ cap distinct values, NULL otherwise. */
  def cappedCollectSet(c: Column, cap: Int)(
      implicit spark: org.apache.spark.sql.SparkSession): Column =
    GraftSqlBridge.column(
      CappedLongCollectSet(GraftSqlBridge.expression(spark, c), cap)
        .toAggregateExpression())
}
