package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 17, closes r16 verdict #7 — the q8serve COLD-cache
  * open question): the r16 warm measurement found the persisted-int8-
  * projection serving delta within host noise because decode CPU is
  * negligible when the bytes are in the page cache; the projection's
  * claimed runtime win is scan BANDWIDTH (1 B vs 4 B per component),
  * which only shows when the bytes actually move — the object-store
  * regime. This tool isolates that regime with a FRESH JVM per sample
  * (no Spark-level caches) and an orchestrating script that drops the
  * OS page cache between invocations, INTERLEAVING arms across JVMs
  * (the r16 lesson: sequential A/B reads phantom deltas).
  *
  *   runMain graft.tools.Q8ColdBench prepare <sfDir> <indexDir>
  *     builds the sf10-shape index once (Q8ServeBench's recipe:
  *     corpus = vec_id %% 7 != 4, k=16, 3 Lloyd iters), ivfSaves it,
  *     and writes the query batch (vec_id %% 7 == 4) beside it.
  *
  *   runMain graft.tools.Q8ColdBench run <indexDir> <bytes|inline> <nprobe> <outJsonl>
  *     ONE un-warmed serving pass through the loaded index ("bytes" =
  *     persisted projection; "inline" = projection stripped, coarse
  *     pass re-reads floats and quantizes inline), appended as a JSON
  *     line. Cold is the point: no warm-up run, fresh JVM.
  */
object Q8ColdBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: prepare <sfDir> <indexDir> | run <indexDir> <bytes|inline> <nprobe> <outJsonl>")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SimilaritySearch
    args(0) match {
      case "prepare" =>
        val sfDir = args(1)
        val indexDir = args(2)
        val e = graft.engine.Tables.t(spark, sfDir, "embeddings")
        val idx = SimilaritySearch.ivfBuild(
          e.filter(col("vec_id") % 7 =!= 4), "vec_id", "embedding",
          k = 16, lloydIters = 3, portableSeeds = true)
        SimilaritySearch.ivfSave(idx, indexDir)
        e.filter(col("vec_id") % 7 === 4)
          .select(col("vec_id").as("q_id"), col("embedding"))
          .write.mode("overwrite").parquet(s"$indexDir" + "_queries")
        println(s"""{"prepared":"$indexDir"}""")
      case "run" =>
        val indexDir = args(1)
        val arm = args(2)
        val nprobe = args(3).toInt
        val out = args(4)
        require(arm == "bytes" || arm == "inline", s"arm must be bytes|inline, got $arm")
        val loaded0 = SimilaritySearch.ivfLoad(spark, indexDir)
        require(loaded0.quantized.isDefined, "saved layout must carry the projection")
        val loaded = if (arm == "bytes") loaded0 else loaded0.copy(quantized = None)
        val queries = spark.read.parquet(s"$indexDir" + "_queries")
        val t0 = System.nanoTime()
        SimilaritySearch.ivfTopKBatchQuantized(
            loaded, queries, "q_id", "embedding", 10, nprobe, 4)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val line = f"""{"arm":"$arm","nprobe":$nprobe,"cold_sec":$sec%.3f}"""
        println(line)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out), (line + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      case "scan" =>
        // the ISOLATED form of the question: one un-warmed pass over
        // each arm's coarse-scan INPUT (the exact frames Q8Diag times
        // warm) — scan + tuple deserialization, no serving compute on
        // top. This is where a 1 B-vs-4 B/component delta must show if
        // it shows anywhere; the full `run` mode buries it under ~60 s
        // of probe/kernel/rerank work.
        val indexDir = args(1)
        val arm = args(2)
        val out = args(3)
        val loaded = SimilaritySearch.ivfLoad(spark, indexDir)
        require(loaded.quantized.isDefined, "saved layout must carry the projection")
        import spark.implicits._
        implicit val sp: SparkSession = spark
        val cq = arm match {
          case "bytes" => loaded.quantized.get.select(
            col("vec_id").cast("long").as("__nid"),
            col("cluster").cast("int").as("__cc"), col("__cq"), col("__cn2"))
          case "inline" => loaded.assigned.select(
              col("vec_id").cast("long").as("__nid"),
              col("cluster").cast("int").as("__cc"),
              graft.functions.VectorFunctions.quantizeInt8(col("embedding")).as("__cq"))
            .withColumn("__cn2",
              graft.functions.VectorFunctions.int8Dot(col("__cq"), col("__cq")))
          case other => sys.error(s"arm must be bytes|inline, got $other")
        }
        val ds = cq.as[(Long, Int, Array[Byte], Long)]
          .mapPartitions { it => var n = 0L; it.foreach(_ => n += 1); Iterator(n) }
        val t0 = System.nanoTime()
        ds.write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val line = f"""{"mode":"scan","arm":"$arm","cold_sec":$sec%.3f}"""
        println(line)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out), (line + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      case other =>
        sys.error(s"unknown mode '$other'")
    }
    spark.stop()
  }
}
