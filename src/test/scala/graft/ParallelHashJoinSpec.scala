package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{ParallelHashJoinApi, ParallelHashJoinExec}

/** Port of the reference's end-to-end join matrix
  * (`/root/reference/src/lib.rs:47-726`): per join type, golden results
  * over the null/no-match/duplicate fixtures, compared order-insensitively,
  * plus plan-shape assertions that the custom operator actually ran —
  * and cross-checks against Spark's built-in joins on the same inputs. */
class ParallelHashJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: Seq[(Integer, String)], idName: String, valName: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idName, IntegerType, nullable = true),
      StructField(valName, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  /** Fixtures from `/root/reference/src/lib.rs:153-166`: null keys must
    * never match. */
  private def leftT = df(Seq((1, "left"), (2, "left"), (null, "left")), "lid", "lval")
  private def rightT = df(Seq((null, "right"), (2, "right"), (3, "right")), "rid", "rval")

  private def pj(l: DataFrame, r: DataFrame, jt: String,
      cond: Option[org.apache.spark.sql.Column] = None): DataFrame =
    ParallelHashJoinApi.parallelHashJoin(l, r, Seq("lid"), Seq("rid"), jt, cond)

  private def sorted(d: DataFrame): Seq[Seq[Any]] =
    d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  private def assertSame(a: DataFrame, b: DataFrame): Unit =
    assert(sorted(a) == sorted(b))

  private def assertUsedCustomExec(d: DataFrame): Unit = {
    val plan = d.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(unwrapped.collect { case e: ParallelHashJoinExec => e }.nonEmpty,
      s"expected ParallelHashJoinExec in plan:\n$unwrapped")
  }

  test("inner join: nulls never match") {
    val r = pj(leftT, rightT, "inner")
    assertUsedCustomExec(r)
    assert(sorted(r) == Seq(Seq(2, "left", 2, "right")))
  }

  test("inner join without matches yields empty") {
    val l = df(Seq((10, "a"), (11, "b")), "lid", "lval")
    val r = df(Seq((20, "x")), "rid", "rval")
    assert(pj(l, r, "inner").count() == 0)
  }

  test("inner join with duplicate keys multiplies") {
    val l = df(Seq((1, "a"), (1, "b")), "lid", "lval")
    val r = df(Seq((1, "x"), (1, "y"), (1, "z")), "rid", "rval")
    assert(pj(l, r, "inner").count() == 6)
  }

  test("left outer: unmatched and null-key left rows padded") {
    val (l, rt) = (leftT, rightT)
    val r = pj(l, rt, "left_outer")
    assert(sorted(r) == sorted(l.join(rt, l("lid") === rt("rid"), "left_outer")))
    assert(r.count() == 3)
  }

  test("right outer preserves probe side") {
    val (l, rt) = (leftT, rightT)
    val r = pj(l, rt, "right_outer")
    assert(sorted(r) == sorted(l.join(rt, l("lid") === rt("rid"), "right_outer")))
  }

  test("full outer emits both unmatched sides") {
    val (l, rt) = (leftT, rightT)
    val r = pj(l, rt, "full_outer")
    assert(sorted(r) == sorted(l.join(rt, l("lid") === rt("rid"), "full_outer")))
    assert(r.count() == 5)
  }

  test("left semi / left anti") {
    assert(sorted(pj(leftT, rightT, "left_semi")) == Seq(Seq(2, "left")))
    assert(sorted(pj(leftT, rightT, "left_anti")) ==
      Seq(Seq(1, "left"), Seq(null, "left")))
  }

  test("right semi / right anti via side swap") {
    assert(sorted(pj(leftT, rightT, "right_semi")) == Seq(Seq(2, "right")))
    assert(sorted(pj(leftT, rightT, "right_anti")) ==
      Seq(Seq(3, "right"), Seq(null, "right")))
  }

  /** `/root/reference/src/lib.rs:636-726`: full outer with residual
    * value-inequality filter. */
  test("full outer with residual filter") {
    import org.apache.spark.sql.functions.col
    val l = df(Seq((1, "left"), (2, "left"), (3, "same"), (4, "left")), "lid", "lval")
    val r = df(Seq((1, "right"), (2, "same"), (3, "right"), (4, "right")), "rid", "rval")
    val cond = Some(col("lval") =!= col("rval"))
    val got = pj(l, r, "full_outer", cond)
    val want = l.join(r, l("lid") === r("rid") && l("lval") =!= r("rval"), "full_outer")
    assertSame(got, want)
  }

  test("residual filter applies to semi and anti") {
    import org.apache.spark.sql.functions.col
    val l = df(Seq((1, "a"), (2, "b")), "lid", "lval")
    val r = df(Seq((1, "a"), (2, "x")), "rid", "rval")
    val cond = Some(col("lval") === col("rval"))
    assert(sorted(pj(l, r, "left_semi", cond)) == Seq(Seq(1, "a")))
    assert(sorted(pj(l, r, "left_anti", cond)) == Seq(Seq(2, "b")))
  }

  test("negative zero double keys match positive zero, like native joins") {
    val schema = StructType(Seq(
      StructField("dk", DoubleType, nullable = true),
      StructField("v", StringType, nullable = true)))
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(0.0, "l0"), Row(1.5, "l1")), 2), schema)
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(-0.0, "r0"), Row(1.5, "r1")), 2),
      StructType(Seq(StructField("dk2", DoubleType, true), StructField("v2", StringType, true))))
    val got = ParallelHashJoinApi.parallelHashJoin(l, r, Seq("dk"), Seq("dk2"), "inner")
    assert(got.count() == 2, "0.0 must match -0.0 and 1.5 must match 1.5")
  }

  test("mismatched key types and arities are rejected loudly") {
    val l = df(Seq((1, "a")), "lid", "lval")
    val r = df(Seq((1, "b")), "rid", "rval")
    intercept[IllegalArgumentException] {
      ParallelHashJoinApi.parallelHashJoin(l, r, Seq("lid"), Seq("rval"), "inner")
    }
    intercept[IllegalArgumentException] {
      ParallelHashJoinApi.parallelHashJoin(l, r, Seq("lid", "lval"), Seq("rid"), "inner")
    }
    intercept[IllegalArgumentException] {
      ParallelHashJoinApi.parallelHashJoin(l, r, Seq("nope"), Seq("rid"), "inner")
    }
  }

  test("matches built-in join on random data for all types") {
    val rnd = new scala.util.Random(42)
    val l = df(Seq.fill(200)((Integer.valueOf(rnd.nextInt(30)), "L" + rnd.nextInt(5))), "lid", "lval")
    val r = df(Seq.fill(150)((Integer.valueOf(rnd.nextInt(30)), "R" + rnd.nextInt(5))), "rid", "rval")
    for (jt <- Seq("inner", "left_outer", "right_outer", "full_outer", "left_semi", "left_anti")) {
      val got = pj(l, r, jt)
      val want = l.join(r, l("lid") === r("rid"), jt)
      assert(sorted(got) == sorted(want), s"join type $jt")
    }
  }
}
