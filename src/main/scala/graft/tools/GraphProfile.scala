package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split profile of the gr1 co-purchase PageRank (the
  * round-6/round-7/round-8 verdict ask): how much of the query is the
  * coOccurrence edge build (distinct incidence → size-capped group
  * self-join → pair aggregation) vs the three pageRank rounds
  * (join-on-src + agg-on-dst per round)?
  *
  *   runMain graft.tools.GraphProfile [sfDir] [samples]
  *
  * Phases (each timed to a noop sink, median of `samples`):
  *   edge_build   coOccurrence pairs only
  *   edge_sym     pairs + symmetrize (what pageRank consumes)
  *   full_gr1     the whole headline query (edges + 3 PR rounds + top100)
  * `pr_rounds` is reported as full_gr1 − edge_sym: the marginal cost of
  * the iteration itself. Informs whether the gr* headline entries
  * should share one edge build (they each rebuild it today) or whether
  * the build is cheap enough that per-query isolation is worth keeping.
  */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val samples = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the EXACT edge build gr1 runs (shared code, not a re-derivation:
    // if the headline recipe's cap/projection changes, this profiler
    // keeps measuring the real thing)
    def copurchase() = graft.queries.GraphQueries.copurchase(spark, sfDir)
    def symmetrized() =
      graft.queries.GraphQueries.symmetrize(copurchase())

    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def time(label: String)(mk: () => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val ts = Seq.fill(samples)(once())
      spark.catalog.clearCache(); System.gc()
      val m = median(ts)
      println(f"$label%-12s median=$m%7.3f s  samples=${ts.map(x => f"$x%.3f").mkString("[", ",", "]")}")
      m
    }

    val eb = time("edge_build")(() => copurchase())
    val es = time("edge_sym")(() => symmetrized())
    val full = time("full_gr1")(() =>
      graft.queries.GraphQueries.pagerank1.fn(spark, sfDir))
    println(f"pr_rounds    derived=${full - es}%7.3f s  (full_gr1 - edge_sym)")
    println(f"""{"edge_build":$eb%.3f,"edge_sym":$es%.3f,"full_gr1":$full%.3f,"pr_rounds":${full - es}%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
