package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Dev tool: throughput of the between-retrains INGEST ENCODE paths
  * (r20 — the new rotated/trained/residual encode ops ship with a
  * measured artifact, not a guess). The even-id half of `embeddings`
  * is the standing corpus every index builds over; the odd half is the
  * ingest batch each tier encodes. Per tier: median-of-3 wall time of
  * one full encode pass (noop sink), reported as rows/sec. The
  * expected shape: every encode is one broadcast + one map, cost ∝
  * batch; the rotated/trained tiers add an O(dim²) integer mat-vec per
  * row (~4k adds at dim 64) and the residual tiers a k·dim assignment
  * dot — both small next to the m·ksub·dsub nearest-code pass, so all
  * six arms should land within a small factor of plain pqEncode.
  *
  *   runMain graft.tools.EncodeBench [sfDir] [outPath]
  */
object EncodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/tmp/graft_sf1")
    val outPath = if (args.length > 1) args(1) else "encode_bench.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.engine.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.filter(pmod(col("vec_id"), lit(2)) === 0).cache()
    val batch = e.filter(pmod(col("vec_id"), lit(2)) === 1).cache()
    val nCorpus = corpus.count()
    val nBatch = batch.count()

    val pq = SimilaritySearch.pqBuild(corpus, "vec_id", "embedding",
      m = 8, ksub = 16, lloydIters = 2)
    val rot = SimilaritySearch.rotPqBuild(corpus, "vec_id", "embedding",
      m = 8, ksub = 16, lloydIters = 2)
    val opq = SimilaritySearch.opqPqBuild(corpus, "vec_id", "embedding",
      m = 8, ksub = 16, lloydIters = 2, opqIters = 2)
    val ivf = SimilaritySearch.ivfBuild(corpus, "vec_id", "embedding",
      k = 16, lloydIters = 3)
    val resid = SimilaritySearch.ivfResidualPqBuild(ivf, m = 8, ksub = 16,
      lloydIters = 2)
    val rres = SimilaritySearch.ivfRotResidualPqBuild(ivf, m = 8, ksub = 16,
      lloydIters = 2)
    val ores = SimilaritySearch.opqResidualPqBuild(ivf, m = 8, ksub = 16,
      lloydIters = 2, opqIters = 2)

    def medianOf3(df: => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      Seq.fill(3)(once()).sorted.apply(1)
    }

    val arms = Seq(
      "pq_encode" -> (() => SimilaritySearch.pqEncode(pq, batch)),
      "rot_pq_encode" -> (() => SimilaritySearch.rotPqEncode(rot, batch)),
      "opq_pq_encode" -> (() => SimilaritySearch.opqPqEncode(opq, batch)),
      "ivf_assign" -> (() => SimilaritySearch.ivfAssign(ivf, batch)),
      "residual_encode" -> (() => SimilaritySearch.ivfResidualPqEncode(resid, batch)),
      "rot_residual_encode" -> (() => SimilaritySearch.rotResidualPqEncode(rres, batch)),
      "opq_residual_encode" -> (() => SimilaritySearch.opqResidualPqEncode(ores, batch)))
    val rows = arms.map { case (name, mk) =>
      val sec = medianOf3(mk())
      System.err.println(f"[encb] $name: $sec%.3f s (${nBatch / sec}%.0f rows/s)")
      f""""$name":{"sec":$sec%.4f,"rows_per_sec":${nBatch / sec}%.0f}"""
    }
    val json =
      s"""{"metric":"ingest_encode","sf":"$sfDir","corpus_rows":$nCorpus,"batch_rows":$nBatch,${rows.mkString(",")}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
  }
}
