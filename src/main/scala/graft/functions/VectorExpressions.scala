package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftSqlBridge
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for the similarity-search operators.
  *
  * Spark's `zip_with`/`aggregate` higher-order functions are interpreted
  * and materialize an intermediate array per call — measured 100×
  * slower on the pairwise near-dup workload (2M pairs × 64 dims). These
  * expressions participate in whole-stage codegen: one primitive loop
  * over the underlying column memory, no allocation. This is the
  * "custom Expression beats UDF beats everything else" path the
  * similarity operators ride at 100 TB.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  @inline protected final def get(a: ArrayData, et: DataType, i: Int): Double =
    et match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }
}

/** dot(a, b) = Σ a_i * b_i over min(len) elements, in double. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"

  /** Null array element → null result, matching what the equivalent
    * zip_with/aggregate formulation produces. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String = elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += ${getter(left, x, i)} * ${getter(right, y, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** ||a||₂ — squared-sum loop + sqrt, codegen'd. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_norm"
  override def dataType: DataType = DoubleType

  private def et: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_norm expects array<float|double>, got $other")
    }

  /** Null array element → null result (see DotProduct). */
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val t = et
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = t match {
        case FloatType => x.getFloat(i).toDouble
        case _ => x.getDouble(i)
      }
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = et match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = ${getter(x, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** Symmetric int8 scalar quantization: each component maps to
  * `floor(x / max|x| * 127 + 0.5)` (round half up, range −127..127),
  * packed into a BinaryType byte buffer — 1 byte per component vs 4
  * for float32. The per-vector scale is NOT stored because cosine
  * similarity cancels it (`(s_a·s_b·Σq_aq_b) / (s_a‖q_a‖·s_b‖q_b‖)`),
  * so the coarse ANN pass runs on pure integers: bit-exact across
  * engines by construction (no FP summation order to worry about) and
  * 4× less memory bandwidth per scanned vector — the number that
  * dominates a brute-force coarse pass at 100 TB. All-zero vectors
  * quantize to all-zero bytes by convention (scale undefined).
  * Null array element → null result, like [[DotProduct]]. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_quantize_int8"
  override def dataType: DataType = BinaryType

  private def et: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_quantize_int8 expects array<float|double>, got $other")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val t = et
    val n = x.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = math.abs(t match {
        case FloatType => x.getFloat(i).toDouble
        case _ => x.getDouble(i)
      })
      if (v > mx) mx = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (mx != 0.0) {
      i = 0
      while (i < n) {
        val v = t match {
          case FloatType => x.getFloat(i).toDouble
          case _ => x.getDouble(i)
        }
        out(i) = math.floor(v / mx * 127.0 + 0.5).toInt.toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = et match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = java.lang.Math.abs(${getter(x, i)});
         |  if ($v > $mx) $mx = $v;
         |}
         |if (!${ev.isNull}) {
         |  byte[] $out = new byte[$n];
         |  if ($mx != 0.0) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      $out[$i] = (byte)(int) java.lang.Math.floor(
         |        ${getter(x, i)} / $mx * 127.0 + 0.5);
         |    }
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

/** Integer dot product over two [[QuantizeInt8]]-packed byte buffers:
  * Σ a_i·b_i over the signed bytes, as a long. Every term is an
  * int multiply (|q| ≤ 127 ⇒ |term| ≤ 16129, no overflow at any real
  * dimensionality), the sum is exact integer arithmetic — the coarse
  * ANN score is therefore bit-identical across engines, partitionings,
  * and aggregation orders, unlike any float dot product.
  *
  * Mismatched buffer lengths THROW rather than silently truncating:
  * BinaryType carries no dimension schema, so a corpus and a query
  * quantized at different dims would otherwise produce a
  * plausible-but-wrong score undetectable downstream. */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_int8_dot"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == BinaryType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_int8_dot expects binary inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = Int8Dot.checkedLength(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = graft.functions.Int8Dot.checkedLength($x.length, $y.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long)($x[$i] * $y[$i]);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

object Int8Dot {
  /** Shared by the interpreted and codegen'd paths (public because the
    * generated Java calls it): equal lengths or a loud failure. */
  def checkedLength(a: Int, b: Int): Int = {
    if (a != b) throw new IllegalArgumentException(
      s"graft_int8_dot: mismatched int8 buffer lengths $a vs $b — " +
        "corpus and query were quantized at different dimensionalities")
    a
  }
}

/** Column-level API. */
object VectorFunctions {
  def dot(a: Column, b: Column)(implicit spark: org.apache.spark.sql.SparkSession): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(spark, a), GraftSqlBridge.expression(spark, b)))

  def norm(a: Column)(implicit spark: org.apache.spark.sql.SparkSession): Column =
    GraftSqlBridge.column(VectorNorm(GraftSqlBridge.expression(spark, a)))

  def quantizeInt8(a: Column)(implicit spark: org.apache.spark.sql.SparkSession): Column =
    GraftSqlBridge.column(QuantizeInt8(GraftSqlBridge.expression(spark, a)))

  def int8Dot(a: Column, b: Column)(implicit spark: org.apache.spark.sql.SparkSession): Column =
    GraftSqlBridge.column(Int8Dot(
      GraftSqlBridge.expression(spark, a), GraftSqlBridge.expression(spark, b)))
}
