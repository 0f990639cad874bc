package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.operators.Checkpoints

/** Round-10 verdict #5: measure the reliable-checkpoint write-per-round
  * cost at sf1. `GraphOpsSpec` proves `spark.graft.checkpoint.reliable`
  * CORRECT at test scale; this tool prices it at soak scale so a
  * cluster deployment knows what the durability posture costs:
  * the two heaviest iterative headline queries (gr1 pageRank — 3 fixed
  * rounds; t19 near-dup components — LSH pairs + propagation rounds)
  * run under BOTH checkpoint flavors against the same data.
  *
  *   runMain graft.tools.ReliableSoak [sfDir] [samples] [query,query,...]
  *
  * Per (query, mode): 1 warm-up + `samples` timed runs to a noop sink;
  * per-run checkpoint-dir hygiene (the eager round-N−1 file deletion in
  * [[Checkpoints.free]] should leave only the FINAL round's files —
  * leftover trees are printed as a leak signal).
  */
object ReliableSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val samples = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckDir = Files.createTempDirectory("graft_reliable_soak")
    spark.sparkContext.setCheckpointDir(ckDir.toString)
    // per-round wall lines interleave with the per-run totals, so the
    // artifact answers WHERE the reliable-vs-local delta lives (round
    // cost vs round skew) — the round-11 verdict's open question
    spark.conf.set("spark.graft.pagerank.roundLog", "true")

    val queries =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("gr1_pagerank_copurchase", "t19_neardup_components")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def leftoverTrees(): Long = {
      val p = new org.apache.hadoop.fs.Path(ckDir.toString)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L
      else {
        val it = fs.listFiles(p, true)
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
    }

    val out = for (q <- queries; reliable <- Seq(false, true)) yield {
      spark.conf.set(Checkpoints.ReliableConf, reliable.toString)
      runOnce(q) // warm-up
      val ts = (1 to samples).map(_ => runOnce(q))
      spark.catalog.clearCache(); System.gc()
      val leak = if (reliable) leftoverTrees() else -1L
      val m = BenchProtocol.median(ts)
      println(f"$q%-26s reliable=$reliable%-5s median=$m%7.2f s  min=${ts.min}%7.2f s  " +
        f"samples=${ts.map(t => f"$t%.2f").mkString("[", ",", "]")}" +
        (if (reliable) s"  leftover_ck_files=$leak" else ""))
      (q, reliable, m, ts.min, leak)
    }
    spark.conf.set(Checkpoints.ReliableConf, "false")
    val json = out.map { case (q, r, m, mn, leak) =>
      s"""{"query":"$q","reliable":$r,"median_s":${f"$m%.3f"},"min_s":${f"$mn%.3f"}""" +
        (if (r) s""","leftover_ck_files":$leak}""" else "}")
    }.mkString("[", ",", "]")
    println(s"""{"reliable_soak":$json,"sf":"$sfDir"}""")
    spark.stop()
  }
}
