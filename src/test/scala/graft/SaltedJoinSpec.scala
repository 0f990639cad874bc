package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SaltedJoin

/** Salting must be invisible in the results: every (fact, dim) pair
  * appears exactly once, unmatched fact rows still null-pad under
  * left_outer, and semantics-breaking join types are rejected. */
class SaltedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sorted(d: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  private lazy val fact = {
    import spark.implicits._
    // skewed: key 1 carries half the rows; key 99 has no dim match
    (1 to 400).map(i => (if (i % 2 == 0) 1L else (i % 7).toLong + 2L, i.toLong))
      .toDF("fk", "fid")
      .union(Seq((99L, 9999L)).toDF("fk", "fid"))
  }
  private lazy val dim = {
    import spark.implicits._
    (1 to 8).map(i => (i.toLong, s"d$i")).toDF("dk", "dv")
  }

  test("inner salted join equals plain join (duplicates included)") {
    val got = SaltedJoin.join(fact, dim, "fk", "dk", col("fid"), saltFactor = 4)
    val want = fact.join(dim, col("fk") === col("dk"))
    assert(sorted(got) == sorted(want))
  }

  test("left_outer salted join preserves unmatched fact rows") {
    val got = SaltedJoin.join(fact, dim, "fk", "dk", col("fid"),
      saltFactor = 4, joinType = "left_outer")
    val want = fact.join(dim, col("fk") === col("dk"), "left_outer")
    assert(sorted(got) == sorted(want))
    assert(got.filter(col("fk") === 99L && col("dv").isNull).count() == 1)
  }

  test("semantics-breaking join types are rejected") {
    intercept[IllegalArgumentException] {
      SaltedJoin.join(fact, dim, "fk", "dk", col("fid"), joinType = "right_outer")
    }
  }

  test("salt spreads a hot key over multiple shuffle keys") {
    val salted = fact.withColumn("__salt", pmod(xxhash64(col("fid")), lit(4)))
    val spread = salted.filter(col("fk") === 1L)
      .select("__salt").distinct().count()
    assert(spread > 1, "hot key must land in more than one salted bucket")
  }
}
