package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomMightContain

/** The codegen'd broadcast-Bloom filter expression that guards the
  * triangle-count closing join (replaced the library's one UDF). */
class BloomMightContainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mightContain(
      bf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      c: org.apache.spark.sql.Column) =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(spark, c), bf))

  test("no false negatives; few false positives; codegen and interpreted agree") {
    import spark.implicits._
    val members = (0L until 1000L).map(_ * 2654435761L)
    val bf = members.toDF("h").stat.bloomFilter("h", 1000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    try {
      val probe = (0L until 2000L).map(_ * 2654435761L).toDF("h")
      // codegen'd path (whole-stage codegen on by default in tests)
      val hits = probe.filter(mightContain(bfB, col("h")))
        .as[Long].collect().toSet
      // every member survives — Bloom's no-false-negative contract is what
      // makes the triangle prefilter unconditionally exact
      assert(members.forall(hits.contains), "false negative: correctness-breaking")
      // non-members (1000 of them) mostly pruned at 1% fpp
      val fp = hits.size - members.size
      assert(fp <= 50, s"implausibly many false positives: $fp")
      // interpreted path agrees bit-for-bit with codegen
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = try probe.filter(mightContain(bfB, col("h"))).as[Long].collect().toSet
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(interp == hits)
      // null in → null out → filtered
      val withNull = Seq[java.lang.Long](members.head, null).toDF("h")
      assert(withNull.filter(mightContain(bfB, col("h"))).count() == 1L)
    } finally bfB.unpersist(blocking = false)
  }

  test("non-bigint input is rejected at analysis") {
    import spark.implicits._
    val bf = Seq(1L).toDF("h").stat.bloomFilter("h", 1L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    try {
      val e = intercept[Exception] {
        Seq("a").toDF("s").filter(mightContain(bfB, col("s"))).collect()
      }
      assert(e.getMessage.toLowerCase.contains("bigint") ||
        e.getMessage.contains("graft_might_contain"))
    } finally bfB.unpersist(blocking = false)
  }
}
