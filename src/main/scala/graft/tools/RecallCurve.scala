package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the measured recall table of the quantized batch-serving
  * arm (round-14 verdict #4). v16's recall had only been pinned on
  * planted fixture geometry; a real user picking `overFetch`/`nprobe`
  * needs the curve on real data at scale. For each dial setting this
  * runs [[graft.operators.SimilaritySearch.ivfTopKBatchQuantized]]
  * over the v15/v16 fixture shape (corpus = vec_id % 7 ≠ 4, queries =
  * the rest, k=16 portable-seeded IVF) and scores recall@`topK`
  * against two exact references:
  *
  *   - `recall_vs_exact_same_nprobe` — [[graft.operators
  *     .SimilaritySearch.ivfTopKBatch]] at the SAME nprobe: isolates
  *     the QUANTIZATION loss (what overFetch buys back);
  *   - `recall_vs_full_exact` — the exact arm probing ALL k clusters
  *     (IVF pruning disabled): the absolute reference a user comparing
  *     against brute force wants (IVF loss × quantization loss).
  *
  * Each quantized run's wall seconds ride along so the recall/cost
  * trade reads off one table.
  *
  *   runMain graft.tools.RecallCurve [sfDir] [outPath] [topK]
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/tmp/graft_sf10")
    val outPath = if (args.length > 1) args(1) else "v16_recall.json"
    val topK = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.engine.Tables.t(spark, sfDir, "embeddings")
    val idx = graft.operators.SimilaritySearch.ivfBuild(
      e.filter(col("vec_id") % 7 =!= 4), "vec_id", "embedding",
      k = 16, lloydIters = 3, portableSeeds = true)
    // pin the assignment: every configuration must be judged against
    // the same index, not a re-run of Lloyd
    idx.assigned.cache().count()
    val queries = e.filter(col("vec_id") % 7 === 4)
      .select(col("vec_id").as("q_id"), col("embedding")).cache()
    val nq = queries.count()

    // top-k answer sets keyed by query — ranks don't matter for recall
    def answerSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

    def recall(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double = {
      val per = truth.toSeq.collect { case (q, t) if t.nonEmpty =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      if (per.isEmpty) 0.0 else per.sum / per.size
    }

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (full, fullSec) = timed(answerSets(
      graft.operators.SimilaritySearch.ivfTopKBatch(
        idx, queries, "q_id", "embedding", topK = topK, nprobe = 16)))
    System.err.println(f"[recall] full-probe exact reference: $fullSec%.1f s")

    val rows = for (nprobe <- Seq(2, 4, 8)) yield {
      val (exactP, exactSec) = timed(answerSets(
        graft.operators.SimilaritySearch.ivfTopKBatch(
          idx, queries, "q_id", "embedding", topK = topK, nprobe = nprobe)))
      System.err.println(f"[recall] exact nprobe=$nprobe: $exactSec%.1f s")
      for (overFetch <- Seq(1, 2, 4, 8)) yield {
        val (quant, quantSec) = timed(answerSets(
          graft.operators.SimilaritySearch.ivfTopKBatchQuantized(
            idx, queries, "q_id", "embedding", topK = topK, nprobe = nprobe,
            overFetch = overFetch)))
        val rSame = recall(quant, exactP)
        val rFull = recall(quant, full)
        System.err.println(
          f"[recall] nprobe=$nprobe overFetch=$overFetch: same=$rSame%.4f full=$rFull%.4f ($quantSec%.1f s)")
        f"""{"nprobe":$nprobe,"overFetch":$overFetch,"recall_vs_exact_same_nprobe":$rSame%.4f,"recall_vs_full_exact":$rFull%.4f,"quant_wall_sec":$quantSec%.2f,"exact_same_nprobe_wall_sec":$exactSec%.2f}"""
      }
    }
    val line =
      f"""{"metric":"v16_recall","sf":"$sfDir","top_k":$topK,"n_queries":$nq,"full_exact_wall_sec":$fullSec%.2f,"rows":${rows.flatten.mkString("[", ",", "]")}}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
