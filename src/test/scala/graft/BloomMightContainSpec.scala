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
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(spark, c), Seq(bf)))

  private def mightContainSharded(
      bfs: Seq[org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]],
      c: org.apache.spark.sql.Column) =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(spark, c), bfs))

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

  test("sharded probe: no false negatives across shards, fpp parity with monolithic") {
    import spark.implicits._
    // the triangle operator's sharded build, replayed in miniature:
    // insert by floorMod(h, S), probe through the sharded expression —
    // including NEGATIVE hashes (xxhash64 spans the full long range,
    // floorMod keeps the route nonnegative)
    val shards = 3
    val members = (0L until 30000L).map(i => i * -2654435761L)
    val fs = Array.fill(shards)(org.apache.spark.util.sketch.BloomFilter
      .create(members.size / shards + 1, 0.01))
    members.foreach(h => fs(java.lang.Math.floorMod(h, shards)).putLong(h))
    val bfs = fs.toSeq.map(spark.sparkContext.broadcast(_))
    val mono = org.apache.spark.util.sketch.BloomFilter.create(members.size, 0.01)
    members.foreach(mono.putLong)
    try {
      val probe = (0L until 60000L).map(i => i * -2654435761L).toDF("h")
      val hits = probe.filter(mightContainSharded(bfs, col("h")))
        .as[Long].collect().toSet
      assert(members.forall(hits.contains), "false negative across shards")
      // fpp parity: same bits-per-item ⇒ shard fp count within 2× of the
      // monolithic filter's on the same 30k non-members (both ~1%)
      val nonMembers = (30000L until 60000L).map(i => i * -2654435761L)
      val fpSharded = hits.size - members.size
      val fpMono = nonMembers.count(mono.mightContainLong)
      assert(fpSharded <= math.max(60, 2 * fpMono),
        s"sharded fpp out of family: sharded=$fpSharded mono=$fpMono")
      // interpreted parity for the multi-shard codegen route
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = try probe.filter(mightContainSharded(bfs, col("h")))
        .as[Long].collect().toSet
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(interp == hits)
    } finally bfs.foreach(_.unpersist(blocking = false))
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
