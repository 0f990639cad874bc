package org.apache.spark.sql.classic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Thin compile-time bridge into Spark's package-private classic API:
  * lets the graft library turn a custom LogicalPlan into a DataFrame and
  * a public Column into its Catalyst Expression. Uses only public Spark
  * machinery semantically — these two calls are what Dataset.join itself
  * performs internally. */
object GraftSqlBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Convert a public Column into a real Catalyst expression tree via the
    * session's ColumnNode converter (what Dataset.filter does). The result
    * may still contain UnresolvedAttribute nodes — run it through the
    * analyzer before execution. */
  def expression(spark: org.apache.spark.sql.SparkSession, c: Column): Expression =
    spark.asInstanceOf[SparkSession].expression(c)

  /** Wrap a Catalyst expression back into a public Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Drop the storage blocks behind a localCheckpoint-backed Dataset
    * (its analyzed plan is a LogicalRDD over the persisted RDD). Lets
    * iterative operators free round N−1's checkpoint the moment round N
    * materializes — the Pregel discipline — instead of waiting for the
    * ContextCleaner's weak-reference sweep. No-op for other plans. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.asInstanceOf[Dataset[_]].queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Reliable-checkpoint file behind a checkpoint-backed Dataset, if
    * any — lets iterative operators delete round N−1's checkpoint
    * FILES eagerly in reliable mode instead of waiting for the
    * ContextCleaner's weak-reference sweep. None for local checkpoints
    * (no files) and non-checkpoint plans. */
  def checkpointFileOf(df: DataFrame): Option[String] =
    df.asInstanceOf[Dataset[_]].queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getCheckpointFile
      case _ => None
    }

  /** True when the session's CacheManager holds no cached plans — lets
    * library specs assert that an API's persist calls are paired with
    * unpersist before it returns (a long-lived session must not
    * accumulate cached blocks across library calls). */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[SparkSession].sharedState.cacheManager.isEmpty

  /** Spark's canonical floating-point key normalization (-0.0 → 0.0,
    * canonical NaN) — the same transform NormalizeFloatingNumbers applies
    * to native join keys, exposed for the custom join operator. */
  def normalizeFloatingKey(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** What an extensions object would inject into a session — lets tests
    * verify GraftExtensions wiring without constructing a new session
    * (the session constructor is private even package-locally). */
  def plannerStrategiesOf(
      extensions: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    extensions.buildPlannerStrategies(spark.asInstanceOf[SparkSession])
      .map(_.asInstanceOf[org.apache.spark.sql.execution.SparkStrategy])

  def injectedFunctionNames(
      extensions: org.apache.spark.sql.SparkSessionExtensions): Seq[String] = {
    val registry = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    extensions.registerFunctions(registry)
    registry.listFunction().map(_.funcName)
  }
}
