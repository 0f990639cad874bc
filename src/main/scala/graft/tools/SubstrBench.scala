package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the t31 scaling observation — wall seconds of
  * [[graft.operators.TextDedup.substringSpanDedup]] (full evaluation
  * through a noop write) at each given SF dir, so the linear-in-tokens
  * claim on the op's scaladoc is a measured ratio rather than an
  * argument. Medians of `iters` runs; a CPU canary rides along for
  * band context.
  *
  *   runMain graft.tools.SubstrBench out.json window dir1 [dir2 ...]
  *
  * `window` (r17 verdict #8's dial): the production Lee-et-al form
  * dedups ~50-token spans while the oracle fixture runs window=6 —
  * passing 50 here shows the window dial does not change the scaling
  * shape. Span-table cardinality (Σ max(0, len−window+1), recorded per
  * run as n_spans) SHRINKS with a larger window; per-span hashing cost
  * grows with the concat width — the product stays ~linear in tokens.
  */
object SubstrBench {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("substr_bench.json")
    // r18 moved `window` into position 1; the pre-r18 shape was
    // `out.json dir1 [dir2 ...]` — accept both (advice r18): a
    // non-numeric arg(1) is a directory and the window stays default
    val oldShape = args.length > 1 && args(1).toIntOption.isEmpty
    val window =
      if (args.length > 1 && !oldShape) args(1).toInt else 6
    val dirArgs = if (oldShape) args.drop(1).toSeq else args.drop(2).toSeq
    val dirs = if (dirArgs.nonEmpty) dirArgs
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
      // the span-table cardinality this window implies (r17 verdict #8:
      // record it next to the wall so the scaling shape is readable)
      val nSpans = docs.selectExpr(
          s"sum(greatest(0, size(split(text, ' ')) - ${window - 1}))")
        .head().getLong(0)
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.TextDedup
          .substringSpanDedup(docs, "doc_id", "text", window = window, minDocs = 2)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val walls = (1 to iters).map(_ => once()).sorted
      val med = walls(walls.length / 2)
      System.err.println(f"[t31] $d: $n docs, $nSpans spans, $med%.3f s median")
      f"""{"dir":"$d","n_docs":$n,"n_spans":$nSpans,"median_sec":$med%.3f,"samples":${
        walls.map(w => f"$w%.3f").mkString("[", ",", "]")}}"""
    }
    val json =
      f"""{"op":"t31_substring_dedup","window":$window,"iters":$iters,"canary_sec":$canary%.3f,
         |"runs":${rows.mkString("[", ",", "]")}}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
  }
}
