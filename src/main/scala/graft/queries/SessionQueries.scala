package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables.t

/** Sessionization + null-semantics extras.
  *
  * Timestamps are compared in microseconds on both engines: Spark reads
  * events.ts as epoch-nanos (Tables.t) and truncates with `div 1000`;
  * DuckDB's parquet reader already truncates TIMESTAMP_NS to µs, so
  * `epoch_us(ts)` lands on the identical integers.
  */
object SessionQueries {

  /** Gap-based sessionization (30-min inactivity): LAG to mark session
    * starts, running SUM to number sessions, then per-session stats —
    * the batch formulation; the streaming formulation with
    * flatMapGroupsWithState lives in graft.streaming and is proven
    * equivalent by PipelineSpec. */
  val sessions: Q = Q(
    "e3_sessions",
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
      |x AS (SELECT user_id, event_id, tus,
      |        CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
      |                 > 1800000000 THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |y AS (SELECT user_id, tus,
      |        CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |      FROM x)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  CAST((MAX(tus) - MIN(tus)) // 1000000 AS BIGINT) AS duration_s
      |FROM y GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus"))
      .withColumn("new_s",
        when(col("tus") - lag(col("tus"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        expr("(max(tus) - min(tus)) div 1000000").as("duration_s"))
      .orderBy("user_id", "session_id")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the
    * semantics branch the reference explicitly REJECTS
    * (`/root/reference/src/operator/use_parallel_hash_join_rule.rs:87-89`
    * guards `null_equals_null == false`); Spark supports it natively,
    * so we cover it as part of the complete join surface. NULLIF
    * manufactures null keys on both sides; null <=> null matches. */
  val nullSafeJoin: Q = Q(
    "j_nullsafe_eq",
    """SELECT
      |  CASE WHEN c_nationkey = 3 THEN 'null_key' ELSE 'real_key' END AS key_class,
      |  COUNT(*) AS n_pairs,
      |  COUNT(DISTINCT s_suppkey) AS n_suppliers
      |FROM customer JOIN supplier
      |  ON NULLIF(c_nationkey, 3) IS NOT DISTINCT FROM NULLIF(s_nationkey, 3)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    c.join(su, nullif(col("c_nationkey"), lit(3)) <=> nullif(col("s_nationkey"), lit(3)))
      .select(when(col("c_nationkey") === 3, "null_key").otherwise("real_key").as("key_class"),
        col("s_suppkey"))
      .groupBy("key_class")
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy("key_class")
  }

  /** Native session_window operator (gap-based session aggregation as a
    * single groupBy — Spark's built-in, streaming-capable form). Session
    * boundary is `>= gap` (window end exclusive), hence the `>=` in the
    * oracle's LAG formulation. */
  val sessionWindow: Q = Q(
    "e4_session_window",
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
      |x AS (SELECT user_id, event_id, tus,
      |        CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
      |                 >= 1800000000 THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |y AS (SELECT user_id,
      |        CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |      FROM x)
      |SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events
      |FROM y GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("event_ts"))
      .groupBy(session_window(col("event_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(sessions, nullSafeJoin, sessionWindow)
}
