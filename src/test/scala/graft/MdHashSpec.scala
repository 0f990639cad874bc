package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Md5Prefix60, MdHashUtil}

/** The codegen'd 60-bit md5 kernel must be bit-identical to the
  * portable SQL formulation `conv(substring(md5(x),1,15),16,10)` it
  * replaced — that equality is what keeps every fingerprint/SimHash
  * oracle on the hash-exact gate after the allocation-churn fix. */
class MdHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fastCol(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.classic.GraftSqlBridge.column(
      Md5Prefix60(org.apache.spark.sql.classic.GraftSqlBridge.expression(spark, c)))

  private def sqlFormulation(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("matches conv(substring(md5)) on edge-case strings through the plan") {
    import spark.implicits._
    val rows = Seq(
      "", " ", "a", "hello world", "héllo wörld", "日本語のテキスト",
      "emoji 🎉🎊", "line\nbreak\ttab", "0", "repeated " * 100,
      " nul", "ſpecial caſe")
    val df = rows.toDF("s")
      .select(fastCol(col("s")).as("fast"), sqlFormulation(col("s")).as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
    assert(df.filter(col("fast").isNull).count() == 0)
  }

  test("matches on arbitrary unicode strings (property)") {
    import spark.implicits._
    val strGen = Gen.listOfN(200, Gen.frequency(
      (4, Gen.asciiPrintableStr),
      (2, Gen.listOf(Gen.choose(1.toChar, 0xD7FF.toChar)).map(_.mkString)),
      (1, Gen.const(""))))
    for (seed <- 1L to 5L) {
      val strs = sample(strGen, seed)
      val df = strs.toDF("s")
        .select(fastCol(col("s")).as("fast"), sqlFormulation(col("s")).as("slow"))
      assert(df.filter(col("fast") =!= col("slow")).count() == 0, s"seed=$seed")
    }
  }

  test("null in, null out") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s").select(fastCol(col("s")).as("fast"))
    assert(df.filter(col("fast").isNull).count() == 1)
  }

  test("static kernel agrees with a from-scratch digest computation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (s <- Seq("", "abc", "日本語", "x" * 1000)) {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = java.lang.Long.parseLong(hex.take(15), 16)
      assert(MdHashUtil.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) == expected, s"input=$s")
    }
  }

  test("kernel output is always a non-negative 60-bit value") {
    val strGen = Gen.listOfN(500, Gen.listOf(Gen.choose(1.toChar, 0xD7FF.toChar)).map(_.mkString))
    for (s <- sample(strGen, 7L)) {
      val v = MdHashUtil.hash60(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(v >= 0L && v < (1L << 60))
    }
  }
}
