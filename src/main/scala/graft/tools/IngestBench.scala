package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool: the growing-index cost curve of streaming ingest dedup
  * (round-13 verdict #6) — [[graft.streaming.IngestStreaming]] is
  * correct-by-spec but had no performance artifact; the 100 TB question
  * is how per-batch wall time behaves as the survivor index grows under
  * it. This drives a REAL N-micro-batch file-source ingest: the
  * even-id half of the table is the standing corpus, the odd half
  * arrives as `nBatches` files (one per micro-batch, mtime-staggered so
  * the source delivers them in order), and a StreamingQueryListener
  * records each trigger's executed wall time and input rows. Post-hoc,
  * the survivor tree gives the exact index size every batch was judged
  * against. Output: one JSON line (and file) with per-batch
  * {input_rows, index_rows, wall_sec, kept}.
  *
  * Two modes (round-14 verdict #7 added the embedding twin):
  *   - `text` — `documents.text` through [[graft.streaming
  *     .IngestStreaming.incrementalDedupStream]] (MinHash banding +
  *     exact tier);
  *   - `embedding` — `embeddings.embedding` through
  *     [[graft.streaming.IngestStreaming
  *     .incrementalEmbeddingDedupStream]] (int8 coarse kernel + exact
  *     cosine verify).
  *
  *   runMain graft.tools.IngestBench [sfDir] [nBatches] [outPath] [mode]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/tmp/graft_sf1")
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val outPath = if (args.length > 2) args(2) else "ingest_bench.json"
    val mode = if (args.length > 3) args(3) else "text"
    require(mode == "text" || mode == "embedding",
      s"mode '$mode' is not text|embedding")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (idCol, payloadCol, table, schema) =
      if (mode == "text") ("doc_id", "text", "documents", "doc_id LONG, text STRING")
      else ("vec_id", "embedding", "embeddings",
        "vec_id LONG, embedding ARRAY<FLOAT>")
    val rows = graft.engine.Tables.t(spark, sfDir, table)
      .select(col(idCol), col(payloadCol))
    val corpus = rows.filter(pmod(col(idCol), lit(2)) === 0)
    val corpusRows = corpus.count()

    // arrival order: content-hash batching (deterministic, balanced)
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_bench").toString
    val srcDir = s"$root/src"
    val arrivals = rows.filter(pmod(col(idCol), lit(2)) === 1)
      .withColumn("__b", pmod(xxhash64(col(idCol)), lit(nBatches)))
    // how many buckets actually carry rows: an empty bucket still
    // produces a file + a zero-row trigger the listener ignores, so the
    // drain target below must be the NON-EMPTY count (round-14 advice:
    // waiting for nBatches burned the full deadline and under-reported
    // n_batches silently when any hash bucket came up empty)
    val bucketCounts = arrivals.groupBy("__b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedNonEmpty = bucketCounts.count(_._2 > 0)
    val base = System.currentTimeMillis() - (nBatches + 1) * 60000L
    for (i <- 0 until nBatches) {
      val before = Option(new java.io.File(srcDir).listFiles())
        .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
      arrivals.filter(col("__b") === i).select(col(idCol), col(payloadCol))
        .coalesce(1).write.mode("append").parquet(srcDir)
      // one mtime per batch, a minute apart: the file source orders by
      // modification time, so delivery order is pinned regardless of
      // filesystem mtime granularity
      new java.io.File(srcDir).listFiles()
        .filter(f => !before.contains(f.getName))
        .foreach(_.setLastModified(base + i * 60000L))
    }

    // the listener gives per-trigger executed wall time; its
    // numInputRows is NOT the arrival count — the foreachBatch body
    // scans the unpersisted source batch several times (exact tier,
    // near tier, final status join, survivor join), and the metric
    // counts source SCANS (measured 4× at sf1) — so true per-batch
    // arrival counts come from the status tree post-hoc instead
    val progress = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0)
          progress.synchronized {
            progress += ((p.batchId,
              p.durationMs.getOrDefault("triggerExecution", -1L) / 1000.0))
          }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val t0 = System.nanoTime()
    val q =
      if (mode == "text")
        graft.streaming.IngestStreaming.incrementalDedupStream(
          corpus, stream, idCol, payloadCol, s"$root/status", s"$root/survivors")
      else
        graft.streaming.IngestStreaming.incrementalEmbeddingDedupStream(
          corpus, stream, idCol, payloadCol, s"$root/status", s"$root/survivors")
    try q.processAllAvailable() finally q.stop()
    val totalSec = (System.nanoTime() - t0) / 1e9
    // the listener bus delivers QueryProgressEvents asynchronously —
    // the tail batch's event can land AFTER processAllAvailable()
    // returns (found in review: the artifact could silently drop the
    // last batch's wall time). Bounded drain wait for the expected
    // NON-EMPTY trigger count (see bucketCounts above).
    val deadline = System.currentTimeMillis() + 30000
    while (progress.synchronized(progress.size) < expectedNonEmpty &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    if (progress.synchronized(progress.size) < expectedNonEmpty)
      System.err.println(
        s"[ingest-bench] captured ${progress.synchronized(progress.size)} of " +
          s"$expectedNonEmpty expected non-empty triggers — the artifact's " +
          "batches array is incomplete")

    // exact per-batch counts from the partition trees the run wrote:
    // statuses = one row per ARRIVED doc, survivors = the keeps
    val arrived = spark.read.parquet(s"$root/status")
      .groupBy(col("batch").cast("long").as("__b")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = spark.read.parquet(s"$root/survivors")
      .groupBy(col("__ingest_batch").cast("long").as("__b")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the index batch i was judged against: corpus + all EARLIER keeps
    val snapshot = progress.synchronized(progress.toVector)
    val batches = snapshot.sortBy(_._1).map { case (bid, sec) =>
      val indexRows = corpusRows +
        kept.filter(_._1 < bid).values.sum
      val k = kept.getOrElse(bid, 0L)
      val a = arrived.getOrElse(bid, 0L)
      f"""{"batch":$bid,"input_rows":$a,"index_rows":$indexRows,"wall_sec":$sec%.3f,"kept":$k}"""
    }.mkString("[", ",", "]")
    val line =
      f"""{"metric":"ingest_batches","mode":"$mode","n_batches":${snapshot.size},"expected_batches":$expectedNonEmpty,"corpus_rows":$corpusRows,"total_sec":$totalSec%.3f,"sf":"$sfDir","batches":$batches}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
