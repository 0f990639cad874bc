package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table registration helpers, mirroring the reference's table providers
  * (`/root/reference/src/lib.rs:796-828` in-memory registration and
  * `/root/reference/tpc/src/main.rs:198-224` parquet auto-registration):
  * each `<name>.parquet` under a scale-factor directory becomes a view.
  *
  * Scale posture: `spark.read.parquet` is a distributed, splittable scan —
  * at 100 TB these would be multi-file partitioned datasets and the same
  * code holds (Spark plans one task per row-group/split; filters and
  * column pruning are pushed to the parquet reader).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table of the testdata star schema.
    *
    * `events.ts` has drifted between parquet encodings across testdata
    * generations (TIMESTAMP(NANOS) first, then TIMESTAMP(MICROS)); query
    * code must never care, so the contract is normalized HERE, at the
    * single read choke point: `ts` is ALWAYS epoch-nanos LongType after
    * this call. See [[normalizeEventTs]]. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // ns-encoded files: Spark 4 rejects TIMESTAMP(NANOS) unless read
      // as raw int64 via the legacy conf (then ts arrives as LongType).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // µs/ms-encoded files arrive as timestamps; their epoch conversion
      // must be wall-clock-naive like DuckDB's epoch_us, which needs a
      // UTC session. Fail loudly rather than silently overriding a
      // caller's deliberate non-UTC session for everything after us.
      requireUtcSession(spark)
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize an events frame so `ts` is epoch-nanos LongType no matter
    * how the parquet file encoded it:
    *   - LongType          → already epoch-nanos (ns file + nanosAsLong)
    *   - Timestamp(_NTZ)   → µs since epoch × 1000 (under the UTC session
    *     timezone a naive timestamp's epoch µs equal DuckDB's epoch_us)
    * Downstream code can then treat `ts` as int64 nanoseconds forever;
    * a future resolution drift lands here, not in every query.
    *
    * The NTZ→Timestamp cast resolves the session timezone at EXECUTION
    * time, so the conversion is only correct under a UTC session — every
    * entry point ([[t]], `EventsStreaming.eventsStream`) pins it, and
    * this asserts it so a caller that later changes the session timezone
    * fails loudly instead of silently skewing every µs-encoded ts. */
  /** The events ts contract is only wall-clock-correct under a UTC
    * session; every entry point configures UTC in its session builder.
    * A non-UTC session fails HERE, loudly, instead of being silently
    * overridden (a `conf.set` would retroactively change timestamp
    * semantics for everything else the caller runs afterwards). */
  private[graft] def requireUtcSession(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"events requires a UTC session timezone, found '$tz' — set " +
        "spark.sql.session.timeZone=UTC in the session builder (all graft " +
        "entry points do); refusing to mutate the caller's session")
  }

  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) | None => df
      case Some(TimestampType) | Some(TimestampNTZType) =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is timestamp-encoded and the session timezone is '$tz': " +
            "the epoch conversion is only wall-clock-correct under UTC — read " +
            "events through Tables.t / EventsStreaming.eventsStream, which pin it")
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(other) =>
        throw new IllegalStateException(s"events.ts has unsupported type $other")
    }

  /** Register every table as a temp view (idempotent), like the
    * reference's `register_parquet` loop. Returns the session. */
  def registerAll(spark: SparkSession, dir: String): SparkSession = {
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark
  }
}
