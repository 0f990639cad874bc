package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables.t
import graft.plans.{GraftOpenMap, ParallelHashJoinApi, ParallelHashJoinExec}

/** The open-addressing build-map variant (reference version10,
  * `/root/reference/src/operator/version10/build_implementation.rs:13-191`)
  * must be a drop-in for the chain map: identical join results across
  * every join type, through both the interpreted and the generated
  * probe loops, including growth well past the initial slot capacity. */
class OpenMapSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private val joinTypes =
    Seq("inner", "left_outer", "right_outer", "full_outer", "left_semi", "left_anti")

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def part = t(spark, dir, "part").select(col("p_partkey"), col("p_size"))
  private def li = t(spark, dir, "lineitem")
    .filter(col("l_quantity") >= 40.0)
    .select(col("l_partkey"), col("l_orderkey"))

  private def collected(d: DataFrame): Seq[Seq[Any]] =
    d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("open map matches built-in join results for all join types") {
    withConf(ParallelHashJoinExec.mapImplKey -> "open",
      // keep the interpreted path so every join type exercises GraftOpenMap
      ParallelHashJoinExec.codegenEnabledKey -> "false") {
      for (jt <- joinTypes) {
        val expected = collected(
          part.join(li, col("p_partkey") === col("l_partkey"), jt))
        val d = ParallelHashJoinApi.parallelHashJoin(
          part, li, Seq("p_partkey"), Seq("l_partkey"), jt)
        assert(collected(d) == expected, s"open-map results for $jt")
      }
    }
  }

  test("open map matches under whole-stage codegen (inner)") {
    withConf(ParallelHashJoinExec.mapImplKey -> "open") {
      val expected = collected(
        part.join(li, col("p_partkey") === col("l_partkey"), "inner"))
      val d = ParallelHashJoinApi.parallelHashJoin(
        part, li, Seq("p_partkey"), Seq("l_partkey"), "inner")
      assert(collected(d) == expected)
      d.collect() // finalize AQE
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val inner = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
          case other => other.children
        }
        p +: inner.flatMap(flatten)
      }
      val fused = flatten(d.queryExecution.executedPlan).exists {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
          w.collectFirst { case p: ParallelHashJoinExec => p }.isDefined
        case _ => false
      }
      assert(fused, "expected ParallelHashJoinExec fused into a codegen stage")
    }
  }

  test("null join keys never match through the open map") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType => LT, StructField, StructType}
    val schema = StructType(Seq(StructField("k", LT, nullable = true),
      StructField("v", LT, nullable = false)))
    def df(rows: Seq[(java.lang.Long, Long)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
    val a = df(Seq((1L: java.lang.Long, 10L), (null, 11L), (2L: java.lang.Long, 12L)))
    val b = df(Seq((1L: java.lang.Long, 20L), (null, 21L), (3L: java.lang.Long, 22L)))
      .withColumnRenamed("k", "k2").withColumnRenamed("v", "v2")
    withConf(ParallelHashJoinExec.mapImplKey -> "open",
      ParallelHashJoinExec.codegenEnabledKey -> "false") {
      for (jt <- Seq("inner", "left_outer", "full_outer", "left_anti")) {
        val expected = collected(a.join(b, col("k") === col("k2"), jt))
        val got = collected(ParallelHashJoinApi.parallelHashJoin(
          a, b, Seq("k"), Seq("k2"), jt))
        assert(got == expected, s"null-key semantics for $jt")
      }
    }
  }

  test("growth past the initial capacity keeps every chain intact") {
    // 10k distinct keys forces several generational growths from the
    // 512-slot initial table; 3 rows per key exercises the chains
    val keyProj = UnsafeProjection.create(
      Seq(BoundReference(0, LongType, nullable = false)))
    val rowProj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](
      LongType, LongType))
    val map = new GraftOpenMap(keyProj)
    val n = 10000
    for (copy <- 0 until 3; k <- 0 until n) {
      map.append(rowProj(InternalRow(k.toLong, (k * 10 + copy).toLong)).copy())
    }
    assert(map.size == 3 * n)
    val probe = UnsafeProjection.create(
      Seq(BoundReference(0, LongType, nullable = false)))
    for (k <- 0 until n) {
      var idx = map.headFor(probe(InternalRow(k.toLong)))
      var vals = List.empty[Long]
      while (idx != -1) {
        assert(map.rowAt(idx).getLong(0) == k.toLong)
        vals ::= map.rowAt(idx).getLong(1)
        idx = map.next(idx)
      }
      assert(vals.sorted == List(k * 10L, k * 10L + 1, k * 10L + 2),
        s"chain for key $k")
    }
    // absent key
    assert(map.headFor(probe(InternalRow(-1L))) == -1)
  }
}
