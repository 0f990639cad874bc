package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

/** The reusable dedup APIs must behave like their fixed-query
  * counterparts: exact() keeps one minimum-id row per distinct text,
  * and minhashPairs() finds the planted near-duplicates (high recall
  * against brute-force shingle Jaccard) without emitting unrelated
  * pairs or a cross product. */
class TextDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = graft.engine.Tables.t(spark, dir, "documents")

  test("exact() keeps one minimum-id row per distinct text") {
    val kept = TextDedup.exact(docs, "doc_id", "text")
    assert(kept.count() == docs.select("text").distinct().count())
    // winners are the minimum doc_id of their text group
    val expected = docs.groupBy("text").agg(min("doc_id").as("doc_id"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      expected.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // idempotent
    assert(TextDedup.exact(kept, "doc_id", "text").count() == kept.count())
  }

  test("minhashPairs() finds planted near-duplicates with high recall") {
    import spark.implicits._
    // plant: 20 base docs, each with a near-duplicate (one word changed
    // out of 30) and an unrelated doc of disjoint vocabulary
    val base = (0 until 20).map { i =>
      val words = (0 until 30).map(w => s"w${i}_$w")
      (i.toLong, words.mkString(" "))
    }
    val nearDup = base.map { case (i, text) =>
      (i + 100L, text.split(" ").updated(7, "CHANGED").mkString(" "))
    }
    val unrelated = (0 until 20).map { i =>
      (i + 200L, (0 until 30).map(w => s"z${i}_$w").mkString(" "))
    }
    val df = (base ++ nearDup ++ unrelated).toDF("id", "text")
    val pairs = TextDedup.minhashPairs(df, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 20).map(i => (i.toLong, i + 100L)).toSet
    val recall = planted.count(pairs.contains).toDouble / planted.size
    assert(recall >= 0.8, s"recall $recall too low; found ${pairs.size} pairs")
    // nothing pairs with the disjoint-vocabulary docs
    assert(!pairs.exists { case (a, b) => a >= 200 || b >= 200 },
      "unrelated docs must not pair")
  }
}
