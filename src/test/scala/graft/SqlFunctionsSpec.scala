package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftFunctionsRegistry

/** The vector kernels exposed as SQL functions (graft_dot/graft_norm),
  * callable from spark.sql after registration. */
class SqlFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("graft_dot and graft_norm work from SQL and match known values") {
    GraftFunctionsRegistry.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       graft_norm(array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS n""".stripMargin)
      .collect().head
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 5.0)
  }

  test("null array elements propagate to null results") {
    GraftFunctionsRegistry.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(CAST(1.0 AS DOUBLE), NULL), array(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) AS d,
        |       graft_norm(array(CAST(1.0 AS DOUBLE), NULL)) AS n,
        |       graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(CAST(1.0 AS DOUBLE))) AS dn""".stripMargin)
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("wrong arity is rejected at registration call") {
    GraftFunctionsRegistry.register(spark)
    val e = intercept[Exception](spark.sql("SELECT graft_norm(array(1.0D), array(2.0D))").collect())
    assert(e.getMessage.contains("graft_norm") || e.getMessage.contains("argument"))
  }

  test("GraftExtensions injects the strategy and both SQL functions") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(exts)
    val strategies = org.apache.spark.sql.classic.GraftSqlBridge
      .plannerStrategiesOf(exts, spark)
    assert(strategies.contains(graft.plans.ParallelHashJoinStrategy))
    val fns = org.apache.spark.sql.classic.GraftSqlBridge.injectedFunctionNames(exts)
    assert(fns.contains("graft_dot") && fns.contains("graft_norm"))
  }

  test("graft_dot on the embeddings table equals the HOF formulation") {
    GraftFunctionsRegistry.register(spark)
    graft.engine.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb")
    val rows = spark.sql(
      """SELECT vec_id,
        |  graft_dot(embedding, embedding) AS d1,
        |  aggregate(zip_with(embedding, embedding,
        |    (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |    CAST(0.0 AS DOUBLE), (a, v) -> a + v) AS d2
        |FROM emb""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9,
      s"vec ${r.getLong(0)}"))
  }
}
