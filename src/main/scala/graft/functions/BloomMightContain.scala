package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_might_contain(long) → boolean` over a BROADCAST Bloom filter —
  * the codegen'd replacement for the boxed-lambda UDF that previously
  * guarded the triangle-count closing join (the single hottest filter in
  * the library: it sees every enumerated wedge, ~700M rows at sf1,
  * before the closing shuffle).
  *
  * Spark's own `BloomFilterMightContain` is internal and expects the
  * filter as a serialized-bytes child (it re-deserializes per partition);
  * this expression instead holds the `Broadcast` handle, so executors
  * read the one already-resident broadcast copy, and whole-stage codegen
  * calls `mightContainLong` directly on a cached field — no per-row
  * boxing, no lambda dispatch, no Option/null ceremony.
  *
  * The broadcast handle itself is what serializes into the task binary
  * (a few bytes); the filter bits move once per executor via the torrent
  * protocol exactly as before. Deterministic, null in → null out.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def prettyName: String = "graft_might_contain"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint hash input, got $other")
  }

  // one lazy dereference per deserialized expression instance (per task),
  // not per row: Broadcast.value is a synchronized lazy lookup
  @transient private lazy val filter: BloomFilter = bloom.value

  override def nullSafeEval(h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val filterCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom, bcCls)
    // cache the dereferenced filter in a generated-class field so the
    // per-row code is a single virtual call on a resident object
    val filterField = ctx.addMutableState(filterCls, "graftBloomFilter",
      v => s"$v = ($filterCls) $bcRef.value();")
    defineCodeGen(ctx, ev, x => s"$filterField.mightContainLong($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** The one blessed construction of the Column form — every call site
    * (the triangle operator and the diagnostics) goes through here so
    * the bridge wiring cannot drift between them. */
  def column(
      spark: org.apache.spark.sql.SparkSession,
      hash: org.apache.spark.sql.Column,
      bloom: Broadcast[BloomFilter]): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.GraftSqlBridge.column(
      BloomMightContain(
        org.apache.spark.sql.classic.GraftSqlBridge.expression(spark, hash),
        bloom))
}
