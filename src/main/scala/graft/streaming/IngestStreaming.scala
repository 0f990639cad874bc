package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextDedup

/** Streaming ingest deduplication — the unbounded form of
  * [[graft.operators.TextDedup.incrementalDedup]]: documents arrive as
  * a Structured Streaming source, and every micro-batch is statused
  * (exact_dup / near_dup / keep) against a GROWING index — the standing
  * corpus plus every previously-accepted survivor — before its own
  * survivors are folded in. This is the shape a 100 TB corpus actually
  * ingests with: the corpus index is computed once, each arriving batch
  * pays only for itself, and accepted documents immediately participate
  * in deduplicating everything that arrives after them.
  *
  * Built on `foreachBatch`, the canonical Structured Streaming pattern
  * for stream-vs-static work that needs full batch semantics (the LSH
  * band join + full-signature verify inside [[TextDedup.incrementalDedup]]
  * are not expressible as a stateless stream-static join, and carrying
  * the growing survivor set is exactly the cross-batch state foreachBatch
  * owns). Micro-batches are processed strictly in order, so the survivor
  * fold is deterministic for a deterministic source.
  *
  * Semantics within ONE micro-batch match the batch operator: rows are
  * judged against the index only, not against each other — two identical
  * fresh documents in the same micro-batch both keep (run
  * [[TextDedup.exact]] inside a custom foreachBatch if intra-batch
  * winners are needed). A duplicate of a batch-N survivor arriving in
  * batch N+1 IS flagged.
  */
object IngestStreaming {

  /** Start the ingest-dedup query. `stream` is a streaming (idCol,
    * textCol, …) frame; statuses (idCol, status) append to `statusDir`
    * as parquet, accepted (idCol, textCol) rows append to
    * `survivorsDir`, and the stream checkpoints under
    * `statusDir/_checkpoint`. Returns the started query — callers drive
    * it (`processAllAvailable()` in tests, awaitTermination in a real
    * ingest). */
  def incrementalDedupStream(
      corpus: DataFrame,
      stream: DataFrame,
      idCol: String,
      textCol: String,
      statusDir: String,
      survivorsDir: String): StreamingQuery = {
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol), col(textCol))
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$statusDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val index =
          if (new java.io.File(survivorsDir).exists())
            base.union(
              spark.read.parquet(survivorsDir).select(col(idCol), col(textCol)))
          else base
        val statuses = TextDedup
          .incrementalDedup(index, batch, idCol, textCol)
          .persist() // two consumers below; freed before the batch commits
        statuses.write.mode("append").parquet(statusDir)
        batch
          .join(statuses.filter(col("status") === "keep").select(col(idCol)),
            Seq(idCol), "left_semi")
          .select(col(idCol), col(textCol))
          .write.mode("append").parquet(survivorsDir)
        statuses.unpersist(blocking = false)
        ()
      }
      .start()
  }
}
