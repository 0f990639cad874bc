package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by the interpreted and codegen paths: the
  * first 60 bits of md5(utf8 bytes) as a non-negative long.
  *
  * Equivalent, bit for bit, to the portable SQL formulation
  * `conv(substring(md5(x), 1, 15), 16, 10)` (≡ DuckDB
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`): the first 15 hex chars
  * of the digest are exactly the top 60 bits of its first 8 bytes read
  * big-endian, so `(be64 >>> 4)` reproduces the parsed value without
  * ever materializing the hex string. The `MessageDigest` and output
  * buffer are thread-local and reused — the SQL formulation allocates
  * a digest, a 32-char hex string, a substring, and a decimal parse
  * PER CALL, which on per-token workloads (SimHash votes every token
  * of every document) made allocation churn the top GC source in the
  * whole bench suite.
  */
object MdHashUtil {
  private val local = new ThreadLocal[(MessageDigest, Array[Byte])] {
    override def initialValue(): (MessageDigest, Array[Byte]) =
      (MessageDigest.getInstance("MD5"), new Array[Byte](16))
  }

  def hash60(s: UTF8String): Long = {
    val (md, buf) = local.get()
    md.reset()
    md.update(s.getBytes)
    md.digest(buf, 0, 16)
    (((buf(0) & 0xffL) << 56) |
      ((buf(1) & 0xffL) << 48) |
      ((buf(2) & 0xffL) << 40) |
      ((buf(3) & 0xffL) << 32) |
      ((buf(4) & 0xffL) << 24) |
      ((buf(5) & 0xffL) << 16) |
      ((buf(6) & 0xffL) << 8) |
      (buf(7) & 0xffL)) >>> 4
  }
}

/** `md5_prefix60(string) → long`: the engine-portable 60-bit content
  * hash behind every fingerprint/shingle/SimHash operator, as a
  * whole-stage-codegen expression (null in → null out). */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_md5_prefix60"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MdHashUtil.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.MdHashUtil.hash60($x)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}
