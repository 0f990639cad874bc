package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-15 verdict #8): quantify the chunked serving
  * drivers' overhead — `chunkedUnion` pays one `count()` plus one
  * filtered pass over `queries` per chunk, so a 3-chunk run against a
  * ONE-SHOT run of the same batch isolates exactly that driver cost
  * (the per-chunk work is the same probe/score/rerank either way; the
  * union is exact by per-query independence). Queries are persisted
  * first, per the drivers' own cache-first guidance — this measures
  * the guidance-followed deployment, and the artifact documents what
  * following it costs.
  *
  * runMain graft.tools.ChunkBench [sfDir] [outJson]
  */
object ChunkBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val out = args.lift(1).getOrElse("/root/repo/results/chunked_overhead.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.engine.Tables.t(spark, sfDir, "embeddings")
    val idx = graft.operators.SimilaritySearch.ivfBuild(
      e.filter(col("vec_id") % 7 =!= 4), "vec_id", "embedding",
      k = 16, lloydIters = 3, portableSeeds = true)
    val assignedC = idx.assigned.persist()
    assignedC.count()
    val idxC = idx.copy(assigned = assignedC)
    val queries = e.filter(col("vec_id") % 7 === 4)
      .select(col("vec_id").as("q_id"), col("embedding"))
      .persist()
    val n = queries.count()
    // chunkTarget n/3 (ceil) -> exactly 3 hash chunks
    val target = (n + 2) / 3
    def med3(df: => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t) / 1e9
      }
      once() // warm
      BenchProtocol.median(Seq.fill(3)(once()))
    }
    import graft.operators.SimilaritySearch._
    val exactOne = med3(ivfTopKBatch(idxC, queries, "q_id", "embedding", 10, 4))
    val exactChunked = med3(ivfTopKBatchChunked(
      idxC, queries, "q_id", "embedding", 10, 4, chunkTarget = target))
    val quantOne = med3(ivfTopKBatchQuantized(idxC, queries, "q_id", "embedding", 10, 4, 4))
    val quantChunked = med3(ivfTopKBatchQuantizedChunked(
      idxC, queries, "q_id", "embedding", 10, 4, 4, chunkTarget = target))
    val line =
      f"""{"metric":"chunked_overhead","sf":"$sfDir","n_queries":$n,"n_chunks":3,"chunk_target":$target,"exact_oneshot_sec":$exactOne%.2f,"exact_chunked3_sec":$exactChunked%.2f,"exact_overhead_ratio":${exactChunked / exactOne}%.3f,"quant_oneshot_sec":$quantOne%.2f,"quant_chunked3_sec":$quantChunked%.2f,"quant_overhead_ratio":${quantChunked / quantOne}%.3f}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
  }
}
