package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis._

/** The text-analysis column functions on constructed documents where
  * the right answer is computable by hand: marker counting (boundary
  * words, no substring false-positives), language argmax, fingerprint
  * canonicalization, and the repetition profile on a planted
  * boilerplate doc. */
class TextAnalysisSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).collect()(0).get(0)
  }

  test("token counts and marker occurrences, including boundaries") {
    assert(one("a b c", tokenCount(col("text"))) == 3)
    assert(one("a b a", distinctTokenCount(col("text"))) == 2)
    // boundary words count; substrings ("theory") do not
    assert(one("the cat near the mat", markerOccurrences(col("text"), "the")) == 2.0)
    assert(one("theory of theatre", markerOccurrences(col("text"), "the")) == 0.0)
    assert(one("the", markerOccurrences(col("text"), "the")) == 1.0)
  }

  test("langId picks the dominant marker language deterministically") {
    assert(one("the cat sat on the mat", langId(col("text"))) == "en")
    assert(one("el gato y la casa y el perro", langId(col("text"))) == "es")
    assert(one("der hund und der mann und", langId(col("text"))) == "de")
    assert(one("le chat et le chien et", langId(col("text"))) == "fr")
    // no markers at all → 'en' fallback
    assert(one("lorem ipsum dolor", langId(col("text"))) == "en")
  }

  test("fingerprint canonicalizes case and whitespace, nothing else") {
    val a = one("  Hello   World ", fingerprint(col("text")))
    val b = one("hello world", fingerprint(col("text")))
    val c = one("hello worlds", fingerprint(col("text")))
    assert(a == b, "case + whitespace normalize to the same fingerprint")
    assert(b != c, "distinct content keeps distinct fingerprints")
  }

  test("quality components are 4-decimal-rounded ratios in [0,1]") {
    val q = one("the quick brown fox jumps over the lazy dog", qualityScore(col("text")))
      .asInstanceOf[Double]
    assert(q > 0.0 && q <= 1.0)
    val d = one("a a a a", diversity(col("text"))).asInstanceOf[Double]
    assert(d == 0.25)
    val n = one("abc!", noiseRatio(col("text"))).asInstanceOf[Double]
    assert(n == 0.25)
  }

  test("slidingChunks covers every token with the configured overlap") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 40).map(i => s"t$i").mkString(" ")), // 40 tokens → 3 chunks
      (2L, "a b c")                                    // shorter than size → 1 chunk
    ).toDF("id", "text")
    val out = graft.operators.TextAnalysis
      .slidingChunks(docs, "id", "text", size = 16, stride = 12)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(c => (c._3, c._4)).toSeq == Seq((0, 16), (12, 16), (24, 16)))
    // chunk text is the exact token slice; neighbors overlap by 4
    assert(d1(0)._5.split(" ").last == "t16" && d1(1)._5.split(" ").head == "t13")
    val d2 = out.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0, 0, 3, "a b c")))
  }

  test("Sampling decisions are content-keyed: stable, order-free, rate-accurate") {
    import spark.implicits._
    val docs = (1 to 2000).map(i => (i.toLong, s"document number $i body")).toDF("id", "text")
    val split = docs.select(col("id"), graft.operators.Sampling.contentSplit(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical content → identical label even under a different row order
    val reversed = docs.orderBy(col("id").desc)
      .select(col("id"), graft.operators.Sampling.contentSplit(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split == reversed, "split must not depend on row order")
    // 12/16 nominal train fraction, generous tolerance
    val frac = split.values.count(_ == "train").toDouble / split.size
    assert(frac > 0.70 && frac < 0.80, s"train fraction $frac off 0.75")
    // stratifiedKeep at 25% keeps roughly a quarter, deterministically
    val kept = docs.filter(graft.operators.Sampling.stratifiedKeep(col("text"), lit(25)))
    val k1 = kept.count(); val k2 = kept.count()
    assert(k1 == k2 && k1 > 400 && k1 < 600, s"kept $k1 of 2000 at rate 25")
  }

  test("repetitionProfile flags the planted boilerplate doc only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam " * 20 + "end"),                      // top_ratio ~20/21
      (2L, (1 to 30).map(i => s"w$i").mkString(" "))   // all distinct
    ).toDF("id", "text")
    val out = repetitionProfile(docs, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(6) == 1, "boilerplate doc must flag repetitive")
    assert(out(2L).getInt(6) == 0)
    assert(out(2L).getLong(1) == 30 && out(2L).getLong(2) == 30)
    assert(out(1L).getLong(3) == 20, "top token count")
  }
}
