package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * `events.ts` is a nanosecond parquet timestamp, which Spark 4 rejects
    * by default — read it as epoch-nanos LongType via the legacy conf;
    * query code treats `ts` as int64 nanoseconds since the epoch. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (idempotent), like the
    * reference's `register_parquet` loop. Returns the session. */
  def registerAll(spark: SparkSession, dir: String): SparkSession = {
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark
  }
}
