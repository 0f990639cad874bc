package graft.tools

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.operators.Checkpoints

/** Round-11 verdict #8: per-ROUND timing of gr1 (pageRank over the
  * co-purchase graph) under local vs reliable checkpointing — does the
  * durable write cost hide inside round-to-round skew for a
  * fixed-size-state loop, or is it a real per-round tax?
  *
  * pageRank is 1 job per round by design (pinned in GraphOpsSpec), so
  * the job timeline IS the round table: this tool records every job's
  * wall time for one run per mode and prints them in order. The
  * repeated near-equal-duration jobs in the middle are the rounds; the
  * reliable-vs-local delta per round answers the question directly
  * instead of inferring it from run medians.
  *
  *   runMain graft.tools.Gr1RoundProfile [sfDir] [query]
  */
object Gr1RoundProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val query = if (args.length > 1) args(1) else "gr1_pagerank_copurchase"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckDir = Files.createTempDirectory("graft_gr1_rounds")
    spark.sparkContext.setCheckpointDir(ckDir.toString)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // attribute each job: the result stage's name carries the
        // triggering action's call site (count / broadcast build /
        // checkpoint / noop write); stages-per-job rides along
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '('))
          .getOrElse("?") + s"/${j.stageInfos.size}st"
        starts.put(j.jobId, (j.time, site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) jobs.add((j.jobId, (j.time - s._1) / 1000.0, s._2))
      }
    })

    def runOnce(label: String): Double = {
      jobs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener settle
      val seq = {
        val it = jobs.iterator(); val b = Seq.newBuilder[(Int, Double, String)]
        while (it.hasNext) b += it.next()
        b.result().sortBy(_._1)
      }
      println(f"[gr1rounds] $label wall=$wall%.1f s jobs=" +
        seq.map { case (id, d, site) => f"$id:$d%.2f($site)" }
          .mkString("[", ", ", "]"))
      spark.catalog.clearCache(); System.gc()
      wall
    }

    for (reliable <- Seq(false, true)) {
      spark.conf.set(Checkpoints.ReliableConf, reliable.toString)
      runOnce(s"warm reliable=$reliable")
      runOnce(s"run1 reliable=$reliable")
      runOnce(s"run2 reliable=$reliable")
    }
    spark.conf.set(Checkpoints.ReliableConf, "false")
    spark.stop()
  }
}
