package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
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
    graft.operators.Events.sessionize(
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus")),
        keys = Seq("user_id"), tsCol = "tus", gap = 1800000000L,
        tieBreak = Seq("event_id"))
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

  /** Backward as-of join: each purchase attaches the most recent
    * at-or-before click of the same user — the temporal-nearest join
    * kdb/Flink pipelines use for feature attribution. Spark lacks a
    * native ASOF; the scalable formulation is union + running MAX over a
    * (user, time)-ordered window: one shuffle on user_id, no range
    * cross-product, works at any key cardinality. Ties at equal
    * timestamps order the reference stream first (at-or-before
    * semantics); the oracle uses the identical formulation. `ts` is
    * nanosecond int64 on the Spark side (nanosAsLong) and TIMESTAMP in
    * DuckDB — both compared in microseconds per the repo playbook. */
  val asofJoin: Q = Q(
    "e5_asof_join",
    """WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events),
      |u AS (SELECT user_id, ts_us, 1 AS is_ref, ts_us AS ref_ts, NULL::BIGINT AS pid
      |      FROM e WHERE event_type = 'click'
      |      UNION ALL
      |      SELECT user_id, ts_us, 0, NULL, event_id FROM e WHERE event_type = 'purchase'),
      |w AS (SELECT user_id, ts_us, is_ref, pid,
      |        MAX(ref_ts) OVER (PARTITION BY user_id ORDER BY ts_us, is_ref DESC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
      |      FROM u)
      |SELECT pid AS event_id, user_id, ts_us AS purchase_us, asof_ts AS click_us
      |FROM w WHERE is_ref = 0 ORDER BY event_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "events")
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"))
    graft.operators.TemporalJoins.asofBackward(
        probe = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us")),
        ref = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us")),
        keys = Seq("user_id"), probeTs = "ts_us", refTs = "ts_us")
      .select(col("event_id"), col("user_id"),
        col("ts_us").as("purchase_us"), col("asof_ts").as("click_us"))
      .orderBy("event_id")
  }

  /** Banded range join: errors joined to same-user clicks within ±1 day.
    * A naive range predicate plans a nested-loop/cartesian per user; the
    * scalable formulation bins time at the band width — each click lands
    * in ONE bin, each error probes its 3 adjacent bins, the join is pure
    * equi on (user, bin), and the exact |Δt| filter runs on the matched
    * pairs only. Shuffle volume is 3× the probe side, never a cross
    * product; each pair is seen exactly once (the click's own bin is
    * among the 3 probed). Oracle states the same semantics as a direct
    * range predicate, which DuckDB can afford at gate scale. */
  val rangeJoin: Q = Q(
    "e6_range_join",
    """WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events),
      |err AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'error'),
      |clk AS (SELECT user_id, ts_us AS c_ts FROM e WHERE event_type = 'click')
      |SELECT err.event_id, err.user_id, CAST(COUNT(*) AS BIGINT) AS n_nearby_clicks
      |FROM err JOIN clk
      |  ON err.user_id = clk.user_id AND abs(err.ts_us - clk.c_ts) <= 86400000000
      |GROUP BY err.event_id, err.user_id ORDER BY err.event_id""".stripMargin) { (s, dir) =>
    val bandUs = 86400000000L // 1 day in microseconds = the bin width
    val e = t(s, dir, "events")
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"))
    graft.operators.TemporalJoins.bandedRangeJoin(
        left = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts_us")),
        right = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us")),
        keys = Seq("user_id"), leftTs = "ts_us", rightTs = "ts_us",
        band = bandUs)
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n_nearby_clicks"))
      .orderBy("event_id")
  }

  /** Ordered funnel analysis: per user, the view → click → purchase
    * conversion stages, where each stage must happen strictly AFTER the
    * previous one (first view, then the first click after it, then the
    * first purchase after that). One groupBy(user) with conditional
    * MIN aggregations evaluated in two window-free passes — no
    * self-joins, scales as two shuffles on user_id. The product-
    * analytics query every event pipeline runs. */
  val funnel: Q = Q(
    "e7_funnel",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
      |v AS (SELECT user_id, MIN(tus) AS first_view FROM e
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(tus) AS first_click FROM e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE event_type = 'click' AND tus > first_view GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(tus) AS first_purchase FROM e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE event_type = 'purchase' AND tus > first_click GROUP BY e.user_id)
      |SELECT v.user_id, v.first_view,
      |  c.first_click, p.first_purchase,
      |  CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS converted
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
    graft.operators.Events.funnel(e, "user_id", "event_type", "tus",
        stages = Seq("view", "click", "purchase"))
      .orderBy("user_id")
  }

  /** Latest-per-key (the ingest "upsert view": keep each key's most
    * recent record) — row_number over (key ORDER BY ts DESC, id DESC),
    * the standard CDC/compaction op. One shuffle on the key; at scale
    * this is the pattern behind merge-on-read snapshot reads. The
    * event_id tiebreak makes the winner deterministic. */
  val latestPerKey: Q = Q(
    "e8_latest_per_key",
    """WITH r AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS tus, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_type, event_id AS latest_event_id, tus AS latest_us,
      |  CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents
      |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    graft.operators.Events.latestPerKey(
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("event_id"),
            expr("ts div 1000").as("tus"), col("value"), col("ts")),
        keys = Seq("user_id", "event_type"), orderCols = Seq("ts", "event_id"))
      .select(col("user_id"), col("event_type"),
        col("event_id").as("latest_event_id"), col("tus").as("latest_us"),
        Num.cents(col("value")).as("value_cents"))
      .orderBy("user_id", "event_type")
  }

  /** Cohort retention: users grouped by first-seen day, distinct active
    * users counted per (cohort, day-offset) — the other half of the
    * product-analytics pair with e7. Day boundaries are exact integer
    * division of epoch-µs, so every number is engine-exact. Two
    * shuffles on user_id plus the final small aggregation; at scale
    * the cohort table is a per-user reduction, never a window. */
  val retention: Q = Q(
    "e9_retention",
    """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |coh AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
      |act AS (SELECT DISTINCT e.user_id, cohort_day, day - cohort_day AS day_offset
      |        FROM e JOIN coh ON e.user_id = coh.user_id)
      |SELECT cohort_day, day_offset, COUNT(*) AS n_users
      |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "events")
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
    val coh = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    e.join(coh, "user_id")
      .select(col("user_id"), col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Event-sequence pattern matching (the MATCH_RECOGNIZE use case
    * expressed relationally): each user's event history becomes an
    * ordered initials string ("vvcvp…"), then a regex classifies the
    * journey — here "converted after an error" (an error anywhere
    * before a later purchase). Ordering is made deterministic by the
    * (ts, event_id) sort key baked into a sortable struct array; the
    * regex is the Java∩RE2 common subset. One shuffle on user_id; the
    * per-user string is bounded by the user's event count. */
  val eventPattern: Q = Q(
    "e10_event_pattern",
    """WITH seq AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), ''
      |      ORDER BY epoch_us(ts), event_id) AS journey
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(len(journey) AS INT) AS n_events,
      |  CASE WHEN regexp_matches(journey, 'e.*p') THEN 1 ELSE 0 END AS error_then_purchase,
      |  ('0x' || substr(md5(journey), 1, 15))::BIGINT AS journey_fp
      |FROM seq ORDER BY user_id""".stripMargin) { (s, dir) =>
    val seq = t(s, dir, "events")
      .select(col("user_id"),
        // µs-truncated sort key: DuckDB truncates the ns parquet
        // timestamp to µs, so ns-granular ordering would diverge
        struct(expr("ts div 1000").as("tus"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ini")).as("ev"))
      .groupBy("user_id")
      .agg(array_join(
        expr("transform(array_sort(collect_list(ev)), x -> x.ini)"), "")
        .as("journey"))
    seq.select(col("user_id"),
        length(col("journey")).cast(IntegerType).as("n_events"),
        when(col("journey").rlike("e.*p"), 1).otherwise(0).as("error_then_purchase"),
        graft.queries.TextQueries.mdHash(col("journey")).as("journey_fp"))
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(sessions, nullSafeJoin, sessionWindow, asofJoin, rangeJoin,
    funnel, latestPerKey, retention, eventPattern)
}
