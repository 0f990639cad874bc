package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage attribution for the batched ANN pass (v15) — where
  * do the sf10 seconds go? Times each prefix of the pipeline through
  * the noop sink. runMain graft.tools.V15Profile [sfDir] */
object V15Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = graft.engine.Tables.t(spark, sfDir, "embeddings")
    val t0 = System.nanoTime()
    val idx = graft.operators.SimilaritySearch.ivfBuild(
      e.filter(col("vec_id") % 7 =!= 4), "vec_id", "embedding",
      k = 16, lloydIters = 3, portableSeeds = true)
    idx.assigned.write.mode("overwrite").format("noop").save()
    println(f"[v15prof] build+assign: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // materialize the assignment once so downstream stages don't
    // re-run the build map per consumer
    val t05 = System.nanoTime()
    val assignedC = idx.assigned.persist()
    println(f"[v15prof] assigned count=${assignedC.count()} in ${(System.nanoTime() - t05) / 1e9}%.2f s")

    val queries = e.filter(col("vec_id") % 7 === 4)
      .select(col("vec_id").as("q_id"), col("embedding"))
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[v15prof] $label: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    // full op (uses idx.assigned, unpersisted build map path)
    time("full ivfTopKBatch")(
      graft.operators.SimilaritySearch.ivfTopKBatch(
        idx, queries, "q_id", "embedding", topK = 3, nprobe = 4))
    // full op over the PERSISTED assignment
    time("full over persisted assigned")(
      graft.operators.SimilaritySearch.ivfTopKBatch(
        idx.copy(assigned = assignedC), queries, "q_id", "embedding",
        topK = 3, nprobe = 4))
    // the quantized sibling: int8 coarse + exact rerank (v9's
    // architecture in batch form)
    time("full ivfTopKBatchQuantized")(
      graft.operators.SimilaritySearch.ivfTopKBatchQuantized(
        idx, queries, "q_id", "embedding", topK = 3, nprobe = 4))
    // quantized arm OVER THE PERSISTED assignment (isolates the
    // build-map re-eval from the kernel scan itself)
    time("quantized over persisted assigned")(
      graft.operators.SimilaritySearch.ivfTopKBatchQuantized(
        idx.copy(assigned = assignedC), queries, "q_id", "embedding",
        topK = 3, nprobe = 4))
    assignedC.unpersist(blocking = false)
    spark.stop()
  }
}
