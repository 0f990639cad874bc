package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the t31 scaling observation — wall seconds of
  * [[graft.operators.TextDedup.substringSpanDedup]] (full evaluation
  * through a noop write) at each given SF dir, so the linear-in-tokens
  * claim on the op's scaladoc is a measured ratio rather than an
  * argument. Medians of `iters` runs; a CPU canary rides along for
  * band context.
  *
  *   runMain graft.tools.SubstrBench out.json dir1 [dir2 ...]
  */
object SubstrBench {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("substr_bench.json")
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val iters = 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val canary = BenchProtocol.canarySeconds(spark)
    val rows = dirs.map { d =>
      val docs = graft.engine.Tables.t(spark, d, "documents")
      val n = docs.count()
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.TextDedup
          .substringSpanDedup(docs, "doc_id", "text", window = 6, minDocs = 2)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val walls = (1 to iters).map(_ => once()).sorted
      val med = walls(walls.length / 2)
      System.err.println(f"[t31] $d: $n docs, $med%.3f s median")
      f"""{"dir":"$d","n_docs":$n,"median_sec":$med%.3f,"samples":${
        walls.map(w => f"$w%.3f").mkString("[", ",", "]")}}"""
    }
    val json =
      f"""{"op":"t31_substring_dedup","window":6,"iters":$iters,"canary_sec":$canary%.3f,
         |"runs":${rows.mkString("[", ",", "]")}}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
  }
}
