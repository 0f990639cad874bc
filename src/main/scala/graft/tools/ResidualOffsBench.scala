package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.SimilaritySearch

/** Dev tool: the residual batch arm's per-query offset layout, measured
  * (r18 verdict #4's "measure before shipping" rule).
  *
  * The pre-r19 `ivfResidualPqTopKBatch` broadcast a (q, cluster) offset
  * table of nQ × k longs and filled ALL k entries per query on the
  * driver, even though the probe mask admits only nprobe of them; r19
  * moved to the (q, probe-slot) layout — nQ × nprobe entries, probed
  * fills only, the kernel recovering a cluster's slot by mask popcount
  * ([[graft.operators.SimilaritySearch]]). At a production-shaped dial
  * (k = 1024 coarse cells, nprobe = 8) the table shrinks 128× (an
  * 8·nQ·k-byte broadcast of mostly-unread zeros → 8·nQ·nprobe) and the
  * driver fill drops k/nprobe ×. This fixture times the WHOLE batch
  * serve end-to-end (build excluded) at that dial, so the same command
  * on the pre-/post-layout commits is the A/B:
  *
  *   runMain graft.tools.ResidualOffsBench [outPath] [nCorpus] [nQueries] [k] [nprobe]
  */
object ResidualOffsBench {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("residual_offs.json")
    val nCorpus = if (args.length > 1) args(1).toInt else 50000
    val nQueries = if (args.length > 2) args(2).toInt else 10000
    val kClusters = if (args.length > 3) args(3).toInt else 1024
    val nprobe = if (args.length > 4) args(4).toInt else 8
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // planted clusters (the PqClusteredBench generator shape) so the
    // coarse quantizer has real structure to find at k=1024
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val anchors: Array[Array[Double]] = Array.tabulate(kClusters) { a =>
      val r = new scala.util.Random(9900 + a)
      unit(Array.fill(dim)(r.nextGaussian()))
    }
    def member(cluster: Int, seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed * 2654435761L + 29)
      val a = anchors(cluster)
      Array.tabulate(dim)(i =>
        (a(i) + r.nextGaussian() * 0.5 / math.sqrt(dim.toDouble)).toFloat)
    }
    val corpus = (0 until nCorpus).map { i =>
      (i.toLong + 1, member(i % kClusters, i.toLong))
    }.toDF("vec_id", "embedding").repartition(32).cache()
    corpus.count()
    val queries = (0 until nQueries).map { q =>
      (1000000L + q, member(q % kClusters, 700000L + q))
    }.toDF("q_id", "qv").repartition(32).cache()
    queries.count()

    val canary = BenchProtocol.canarySeconds(spark)
    val ivf = SimilaritySearch.ivfBuild(corpus, "vec_id", "embedding",
      k = kClusters, lloydIters = 2)
    val rpq = SimilaritySearch.ivfResidualPqBuild(ivf, m = 8, ksub = 16,
      lloydIters = 1)
    rpq.encoded.cache().count()

    def serveOnce(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SimilaritySearch.ivfResidualPqTopKBatch(rpq, queries, "q_id",
        "qv", topK = 10, nprobe = nprobe, overFetch = 4).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    serveOnce() // warm
    val runs = (1 to 3).map(_ => serveOnce())
    val med = runs.map(_._1).sorted.apply(runs.size / 2)
    val rows = runs.head._2
    val canaryEnd = BenchProtocol.canarySeconds(spark)

    val json =
      f"""{"n_corpus":$nCorpus,"n_queries":$nQueries,"k":$kClusters,
         |"nprobe":$nprobe,"dim":$dim,"serve_sec_median3":$med%.3f,
         |"result_rows":$rows,
         |"canary_sec":${(canary + canaryEnd) / 2}%.3f}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
  }
}
