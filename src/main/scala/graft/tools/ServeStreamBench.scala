package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 17, closes r16 verdict #4): the streaming ANN
  * serving surface's missing perf artifact. Drives a REAL
  * [[graft.streaming.ServeStreaming.ivfServeStream]] file-source
  * stream (the PipelineSpec recipe: one parquet file per micro-batch,
  * `maxFilesPerTrigger=1`, wall time around `processAllAvailable` per
  * added file) against a persisted sf1 index, for batch sizes ~1k and
  * ~10k on both arms (exact / IVF-SQ8), and separately samples the
  * per-batch `ivfLoad` re-resolution cost the stream pays BY DESIGN
  * every micro-batch (the refresh mechanism — CURRENT pointer + k
  * centroid rows + two file listings).
  *
  * runMain graft.tools.ServeStreamBench [sfDir] [outJson]
  */
object ServeStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val out = args.lift(1).getOrElse("/root/repo/results/serve_stream.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SimilaritySearch
    val root = java.nio.file.Files.createTempDirectory("graft_servebench").toString
    val idxDir = s"$root/index"
    val e = graft.engine.Tables.t(spark, sfDir, "embeddings").persist()
    val nCorpus = e.count()
    val idx = SimilaritySearch.ivfBuild(
      e, "vec_id", "embedding", k = 16, lloydIters = 3, portableSeeds = true)
    SimilaritySearch.ivfSave(idx, idxDir)
    // the per-micro-batch index re-resolution cost, sampled solo: this
    // is what EVERY batch pays before any serving work (CURRENT read,
    // centroid fetch, file listings; the corpus data itself is read
    // only by the pruned serving scan)
    def loadOnce(): Double = {
      val t0 = System.nanoTime()
      SimilaritySearch.ivfLoad(spark, idxDir)
      (System.nanoTime() - t0) / 1e9
    }
    loadOnce() // warm: parquet footer + codegen
    val loadSecs = Seq.fill(5)(loadOnce())
    val nBatches = 5
    // the 2x2 grid with the resolved-version cache ON (the default),
    // plus cache-OFF arms at 1k rows — the batch size where the
    // unconditional per-batch ivfLoad is proportionally largest — to
    // measure what the cache buys (the r16 verdict #4 follow-up rule:
    // measure the obvious fix before shipping it)
    val grid = Seq(
      (false, 1000, true), (false, 10000, true),
      (true, 1000, true), (true, 10000, true),
      (false, 1000, false), (true, 1000, false))
    val configs = grid.map { case (quantized, batchSize, cacheIdx) =>
      val arm = (if (quantized) "sq8" else "exact") +
        (if (cacheIdx) "" else "_nocache")
      val srcDir = s"$root/queries_${arm}_$batchSize"
      val outDir = s"$root/answers_${arm}_$batchSize"
      // batch 0 must exist before readStream resolves the source dir;
      // its timing includes stream-start overhead — reported in the
      // list, the steady-state median drops it
      def writeBatch(b: Int): Unit = e
        .select((col("vec_id") + lit(1000000L * (b + 1))).as("q_id"),
          col("embedding"))
        .limit(batchSize)
        .coalesce(1).write.mode("append").parquet(srcDir)
      writeBatch(0)
      val stream = spark.readStream
        .schema("q_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      val q = graft.streaming.ServeStreaming.ivfServeStream(
        stream, idxDir, "q_id", "embedding", outDir,
        topK = 10, nprobe = 4, overFetch = 4, quantized = quantized,
        cacheIndex = cacheIdx)
      val batchSecs = try {
        (0 until nBatches).map { b =>
          if (b > 0) writeBatch(b)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      val med = BenchProtocol.median(batchSecs.drop(1)) // steady-state
      f"""{"arm":"$arm","batch_rows":$batchSize,"cache_index":$cacheIdx,"batch_secs":[${batchSecs.map(s => f"$s%.3f").mkString(",")}],"median_warm_sec":$med%.3f}"""
    }
    val loadMed = BenchProtocol.median(loadSecs)
    val line =
      f"""{"metric":"serve_stream","sf":"$sfDir","corpus_rows":$nCorpus,"ivf_load_secs":[${loadSecs.map(s => f"$s%.3f").mkString(",")}],"ivf_load_median_sec":$loadMed%.3f,"configs":[${configs.mkString(",")}]}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    // reap the temp tree (index + query files + answers)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(root))
    spark.stop()
  }
}
