package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.SimilaritySearch

/** Phase gauge for the quantized near-dup pipeline: candidate volume
  * and wall time of the coarse stage vs the full verify at a given
  * bound — the margin is a recall/volume dial and this is its meter.
  *
  *   runMain graft.tools.QuantProbe [sfDir] [threshold] [margin]
  */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val threshold = if (args.length > 1) args(1).toDouble else 0.45
    val margin = if (args.length > 2) args(2).toDouble else 0.05
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, dir, "embeddings")
    println(s"[probe] vectors: ${emb.count()}")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val nCand = timed(s"coarse bound=${threshold - margin}") {
      SimilaritySearch.quantizedCandidatePairs(
        emb, "vec_id", "embedding", threshold - margin).count()
    }
    println(s"[probe] candidates: $nCand")
    val nOut = timed(s"full verify threshold=$threshold") {
      SimilaritySearch.quantizedNearDupPairs(
        emb, "vec_id", "embedding", threshold, margin).count()
    }
    println(s"[probe] verified pairs: $nOut")
    val nExact = timed("exact arm") {
      SimilaritySearch.cosineNearDupPairs(
        emb, "vec_id", "embedding", threshold).count()
    }
    println(s"[probe] exact pairs: $nExact")
    spark.stop()
  }
}
