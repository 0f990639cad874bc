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

  // ---- generative spill matrix (round-10 verdict #7) ----------------
  // The chunked grace fallback (ParallelHashJoinExec doExecute's spill
  // branch) is the least-exercised path of the most important operator:
  // random key TYPES (int / long / string / double incl. NaN and ±0.0 —
  // the floating normalization branch), random NULL RATES, random row
  // counts incl. empty sides, ALL EIGHT join types, both map layouts,
  // with and without a residual condition, under a few-byte budget that
  // forces multiple chunks per partition — every cell asserted equal to
  // the equivalent native Spark join.

  private def typedKeyGen(t: DataType, nullTenths: Int): Gen[Any] = {
    val base: Gen[Any] = t match {
      case IntegerType => Gen.chooseNum(0, 5).map(Integer.valueOf(_))
      case LongType => Gen.chooseNum(-3L, 3L).map(java.lang.Long.valueOf(_))
      case StringType => Gen.oneOf("a", "b", "c", "dd", "")
      case DoubleType => Gen.oneOf[Any](
        java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(-0.0),
        java.lang.Double.valueOf(1.5), java.lang.Double.valueOf(-2.25),
        java.lang.Double.valueOf(Double.NaN))
      case other => throw new IllegalArgumentException(other.toString)
    }
    Gen.frequency((10 - nullTenths, base), (nullTenths, Gen.const(null)))
  }

  private def typedTableGen(t: DataType, nullTenths: Int): Gen[List[(Any, Int)]] =
    Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.zip(typedKeyGen(t, nullTenths), Gen.chooseNum(0, 99))))

  private def typedDf(rows: Seq[(Any, Int)], t: DataType, k: String, v: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(k, t, nullable = true),
      StructField(v, IntegerType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  /** Native-Spark oracle for all 8 types: right_semi/right_anti (absent
    * from the public join API) are left_semi/left_anti with the sides
    * swapped — the semantic definition, independent of the exec's
    * probe-preserving kernel. */
  private def nativeJoin(l: DataFrame, r: DataFrame, jt: String,
      cond: Option[org.apache.spark.sql.Column]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val eq = l("lk") === r("rk")
    val full = cond.map(eq && _).getOrElse(eq)
    jt match {
      case "right_semi" => r.join(l, full, "left_semi")
      case "right_anti" => r.join(l, full, "left_anti")
      case _ => l.join(r, full, jt)
    }
  }

  test("generative spill matrix: schemas x null rates x all 8 types x both map layouts") {
    val allTypes = Seq("inner", "left_outer", "right_outer", "full_outer",
      "left_semi", "left_anti", "right_semi", "right_anti")
    val saved = Seq(graft.plans.ParallelHashJoinExec.spillThresholdKey,
      graft.plans.ParallelHashJoinExec.codegenEnabledKey,
      graft.plans.ParallelHashJoinExec.mapImplKey)
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set(graft.plans.ParallelHashJoinExec.spillThresholdKey, "64")
    spark.conf.set(graft.plans.ParallelHashJoinExec.codegenEnabledKey, "false")
    try {
      import org.apache.spark.sql.functions.col
      val cells = for {
        (keyType, seedBase) <- Seq(
          (IntegerType: DataType) -> 300L, (LongType: DataType) -> 320L,
          (StringType: DataType) -> 340L, (DoubleType: DataType) -> 360L)
        nullTenths <- Seq(0, 2, 5)
      } yield (keyType, seedBase + nullTenths, nullTenths)
      for (((keyType, seed, nullTenths), cellIdx) <- cells.zipWithIndex) {
        // alternate the layout across cells so both see every key type
        val layout = if (cellIdx % 2 == 0) "chain" else "open"
        spark.conf.set(graft.plans.ParallelHashJoinExec.mapImplKey, layout)
        val lRows = sample(typedTableGen(keyType, nullTenths), seed)
        val rRows = sample(typedTableGen(keyType, nullTenths), seed + 1000)
        val l = typedDf(lRows, keyType, "lk", "lv")
        val r = typedDf(rRows, keyType, "rk", "rv")
        for (jt <- allTypes) {
          val cond = if (cellIdx % 3 == 0) Some(col("lv") < col("rv")) else None
          val got = ParallelHashJoinApi.parallelHashJoin(
            l, r, Seq("lk"), Seq("rk"), jt, cond)
          val want = nativeJoin(l, r, jt, cond)
          assert(sorted(got) == sorted(want),
            s"spill matrix: key=$keyType nulls=$nullTenths/10 layout=$layout " +
              s"jt=$jt cond=${cond.nonEmpty} seed=$seed l=$lRows r=$rRows")
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
