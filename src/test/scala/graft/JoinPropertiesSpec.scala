package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ParallelHashJoinApi

/** Property-based join semantics (beyond the reference's test strategy,
  * SURVEY.md §5 last row): for arbitrary small tables — with null keys,
  * duplicate keys, empty sides — the custom exec must agree with
  * Spark's built-in join for every supported type. ScalaCheck
  * generators are sampled under fixed seeds so failures replay. */
class JoinPropertiesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "3")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val keyGen: Gen[Integer] = Gen.frequency(
    (8, Gen.chooseNum(0, 6).map(Integer.valueOf)),
    (1, Gen.const(null.asInstanceOf[Integer])))
  private val tableGen: Gen[List[(Integer, Int)]] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(keyGen, Gen.chooseNum(0, 99))))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def df(rows: Seq[(Integer, Int)], k: String, v: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(k, IntegerType, nullable = true),
      StructField(v, IntegerType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  private def sorted(d: DataFrame): Seq[String] =
    d.collect().toSeq.map(_.toSeq.mkString("|")).sorted

  test("custom join equals built-in join on arbitrary tables, all types") {
    for (seed <- 1L to 12L) {
      val lRows = sample(tableGen, seed)
      val rRows = sample(tableGen, seed + 1000)
      val l = df(lRows, "lk", "lv")
      val r = df(rRows, "rk", "rv")
      for (jt <- Seq("inner", "left_outer", "right_outer", "full_outer", "left_semi", "left_anti")) {
        val got = ParallelHashJoinApi.parallelHashJoin(l, r, Seq("lk"), Seq("rk"), jt)
        val want = l.join(r, l("lk") === r("rk"), jt)
        assert(sorted(got) == sorted(want), s"seed=$seed join type $jt, l=$lRows, r=$rRows")
      }
    }
  }

  test("chunked spill path equals built-in join on arbitrary tables, all types") {
    // a few-byte budget forces the grace path (multiple chunks per
    // partition) even on these tiny tables; codegen off because the
    // chunked fallback lives on the interpreted doExecute
    val saved = Seq(graft.plans.ParallelHashJoinExec.spillThresholdKey,
      graft.plans.ParallelHashJoinExec.codegenEnabledKey)
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set(graft.plans.ParallelHashJoinExec.spillThresholdKey, "64")
    spark.conf.set(graft.plans.ParallelHashJoinExec.codegenEnabledKey, "false")
    try {
      import org.apache.spark.sql.functions.col
      for (seed <- 200L to 208L) {
        val lRows = sample(tableGen, seed)
        val rRows = sample(tableGen, seed + 1000)
        val l = df(lRows, "lk", "lv")
        val r = df(rRows, "rk", "rv")
        for (jt <- Seq("inner", "left_outer", "right_outer", "full_outer", "left_semi", "left_anti")) {
          val got = ParallelHashJoinApi.parallelHashJoin(l, r, Seq("lk"), Seq("rk"), jt)
          val want = l.join(r, l("lk") === r("rk"), jt)
          assert(sorted(got) == sorted(want), s"spill seed=$seed $jt, l=$lRows, r=$rRows")
          val gotC = ParallelHashJoinApi.parallelHashJoin(l, r, Seq("lk"), Seq("rk"), jt,
            Some(col("lv") < col("rv")))
          val wantC = l.join(r, l("lk") === r("rk") && col("lv") < col("rv"), jt)
          assert(sorted(gotC) == sorted(wantC), s"spill+cond seed=$seed $jt")
        }
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("custom join with residual condition equals built-in, property-based") {
    import org.apache.spark.sql.functions.col
    for (seed <- 100L to 107L) {
      val lRows = sample(tableGen, seed)
      val rRows = sample(tableGen, seed + 1000)
      val l = df(lRows, "lk", "lv")
      val r = df(rRows, "rk", "rv")
      for (jt <- Seq("inner", "full_outer", "left_semi", "left_anti")) {
        val got = ParallelHashJoinApi.parallelHashJoin(l, r, Seq("lk"), Seq("rk"), jt,
          Some(col("lv") < col("rv")))
        val want = l.join(r, l("lk") === r("rk") && col("lv") < col("rv"), jt)
        assert(sorted(got) == sorted(want), s"seed=$seed join type $jt, l=$lRows, r=$rRows")
      }
    }
  }
}
