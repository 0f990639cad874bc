package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 16): the persisted-int8-projection serving win —
  * the same quantized batch serve through an [[graft.operators
  * .SimilaritySearch.ivfLoad]]-ed index WITH its materialized
  * projection (coarse pass reads persisted bytes, 1 B/component, no
  * quantize expression) vs the projection stripped (coarse pass
  * re-reads float vectors, 4 B/component, and quantizes inline).
  * Same index, same batch, same answers (spec'd bit-identical);
  * the delta is pure data-path.
  *
  * runMain graft.tools.Q8ServeBench [sfDir] [outJson]
  */
object Q8ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val out = args.lift(1).getOrElse("/root/repo/results/q8serve.json")
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
    val dir = "/tmp/graft_q8serve_index"
    val tSave0 = System.nanoTime()
    graft.operators.SimilaritySearch.ivfSave(idx, dir)
    val saveSec = (System.nanoTime() - tSave0) / 1e9
    val loaded = graft.operators.SimilaritySearch.ivfLoad(spark, dir)
    require(loaded.quantized.isDefined, "saved layout must carry the projection")
    val queries = e.filter(col("vec_id") % 7 === 4)
      .select(col("vec_id").as("q_id"), col("embedding"))
      .persist()
    queries.count()
    // INTERLEAVED A/B sampling (self-review: a first sequential run
    // read bytes 1.58x SLOWER at nprobe=4 yet 1.26x FASTER at
    // nprobe=16 — while a scan+deserialize diagnostic (Q8Diag) showed
    // the two inputs cost identically, implicating measurement-order
    // effects, not the data path; alternating samples put both arms in
    // the same JVM/band window)
    def medAB(a: => org.apache.spark.sql.DataFrame,
              b: => org.apache.spark.sql.DataFrame): (Double, Double) = {
      // once takes the arm BY NAME and forces it after the timer starts
      // (self-review: a strict parameter evaluated the arm at the call
      // site, excluding the eager driver-side serving work — count,
      // probe collect, int8 packing, broadcast build — from every
      // sample, understating absolute wall time; ChunkBench.med3 times
      // construction inside once() for the same reason)
      def once(df: => org.apache.spark.sql.DataFrame): Double = {
        val t = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t) / 1e9
      }
      once(a); once(b) // warm both
      val pairs = Seq.fill(3)((once(a), once(b)))
      (BenchProtocol.median(pairs.map(_._1)), BenchProtocol.median(pairs.map(_._2)))
    }
    import graft.operators.SimilaritySearch._
    // nprobe=16 removes partition pruning from the comparison: both
    // arms read EVERY cluster, so the delta is bytes+expression only;
    // nprobe=4 is the deployment shape (pruning helps both equally)
    val rows = Seq(4, 16).map { np =>
      val (bytes, inline) = medAB(
        ivfTopKBatchQuantized(loaded, queries, "q_id", "embedding", 10, np, 4),
        ivfTopKBatchQuantized(
          loaded.copy(quantized = None), queries, "q_id", "embedding", 10, np, 4))
      f"""{"nprobe":$np,"persisted_bytes_sec":$bytes%.2f,"inline_quant_sec":$inline%.2f,"speedup":${inline / bytes}%.3f}"""
    }
    val line =
      f"""{"metric":"q8_serve","sf":"$sfDir","save_sec":$saveSec%.2f,"rows":[${rows.mkString(",")}]}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
  }
}
