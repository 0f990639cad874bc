package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory mirroring the reference's `make_session_state_with_config`
  * (`/root/reference/src/parse_sql.rs:26-76`): parallelism knob
  * (= DataFusion `target_partitions` → `spark.sql.shuffle.partitions`),
  * deterministic UTC timezone, and the balance/skew story.
  *
  * The reference's `WorkStealingRepartitionExec`
  * (`/root/reference/src/operator/work_stealing_repartition_exec.rs:129-296`)
  * rebalances work between probe partitions at task granularity. Spark's
  * execution model has no intra-stage work stealing; the idiomatic
  * equivalent — enabled here — is AQE: runtime coalescing of small
  * partitions and skew-join splitting achieve the same goal (no idle
  * cores while one partition holds the long tail) at stage granularity.
  */
object GraftSession {
  def build(
      master: String = "local[*]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Work-stealing analog: adaptive execution + skew mitigation.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
