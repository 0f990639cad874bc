package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_might_contain(long) → boolean` over a KEY-SHARDED set of
  * BROADCAST Bloom filters — the codegen'd replacement for the
  * boxed-lambda UDF that previously guarded the triangle-count closing
  * join (the single hottest filter in the library: it sees every
  * enumerated wedge, ~700M rows at sf1, before the closing shuffle).
  *
  * Sharding: hash `h` routes to filter `floorMod(h, S)` — the SAME rule
  * the build side uses to insert, so an item inserted anywhere is probed
  * in exactly the filter that holds it (no false negatives across the
  * split), and each broadcast object stays bounded (~64 MB by default)
  * no matter how many items the whole set covers. `S = 1` degenerates to
  * the classic single-filter probe with no `floorMod` in the generated
  * code.
  *
  * Spark's own `BloomFilterMightContain` is internal and expects the
  * filter as a serialized-bytes child (it re-deserializes per partition);
  * this expression instead holds the `Broadcast` handles, so executors
  * read the already-resident broadcast copies, and whole-stage codegen
  * calls `mightContainLong` directly on cached fields — no per-row
  * boxing, no lambda dispatch, no Option/null ceremony.
  *
  * The broadcast handles themselves are what serialize into the task
  * binary (a few bytes each); the filter bits move once per executor via
  * the torrent protocol exactly as before. Deterministic, null in → null
  * out.
  */
case class BloomMightContain(child: Expression, blooms: Seq[Broadcast[BloomFilter]])
    extends UnaryExpression {
  require(blooms.nonEmpty, "graft_might_contain needs at least one bloom shard")
  override def prettyName: String = "graft_might_contain"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint hash input, got $other")
  }

  // one dereference per deserialized expression instance (per task),
  // not per row: Broadcast.value is a synchronized lazy lookup
  @transient private lazy val filters: Array[BloomFilter] =
    blooms.map(_.value).toArray

  override def nullSafeEval(h: Any): Any = {
    val hv = h.asInstanceOf[Long]
    filters(java.lang.Math.floorMod(hv, filters.length)).mightContainLong(hv)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val filterCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("graftBloomBcs", blooms.toArray, s"$bcCls[]")
    // cache the dereferenced filters in a generated-class field so the
    // per-row code is a single virtual call on a resident object
    val filtersField = ctx.addMutableState(s"$filterCls[]", "graftBloomFilters",
      v => s"""$v = new $filterCls[$bcRef.length];
         |for (int i = 0; i < $bcRef.length; i++) {
         |  $v[i] = ($filterCls) $bcRef[i].value();
         |}""".stripMargin)
    if (blooms.length == 1) {
      defineCodeGen(ctx, ev, x => s"$filtersField[0].mightContainLong($x)")
    } else {
      defineCodeGen(ctx, ev, x =>
        s"$filtersField[java.lang.Math.floorMod($x, ${blooms.length})]" +
          s".mightContainLong($x)")
    }
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
      blooms: Seq[Broadcast[BloomFilter]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.GraftSqlBridge.column(
      BloomMightContain(
        org.apache.spark.sql.classic.GraftSqlBridge.expression(spark, hash),
        blooms))

  /** Single-filter convenience (the S = 1 degenerate). */
  def column(
      spark: org.apache.spark.sql.SparkSession,
      hash: org.apache.spark.sql.Column,
      bloom: Broadcast[BloomFilter]): org.apache.spark.sql.Column =
    column(spark, hash, Seq(bloom))
}
