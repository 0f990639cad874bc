package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (round 17): the recall/candidate-volume curve of the
  * banded-LSH semantic-dedup pair generator (v19) against v18's exact
  * all-pairs ground truth on the SAME corpus — the "recall-vs-exact-
  * pairs note" of round-16 verdict #3. For each (bands, bitsPerBand)
  * config: candidate count (threshold −1 admits every bucket
  * collision), verified pair count at the v4 threshold, and recall =
  * |banded ∩ exact| / |exact| (banded ⊆ exact by construction — the
  * verify stage is the exact kernel — so recall is the candidate
  * generator's alone).
  *
  * Context for reading the numbers: this corpus's planted near-dups
  * sit at cos 0.45–0.6, near hyperplane-LSH's noise floor (bit-
  * agreement p ≈ 0.65 at the 0.45 threshold vs 0.5 for random pairs),
  * so the recall/volume trade-off is deliberately adversarial; at a
  * production dedup threshold (cos ≥ 0.9, p ≈ 0.86) the same ship
  * config (24 × 6) is ~1.0 recall.
  *
  * runMain graft.tools.V19Recall [sfDir] [outJson]
  */
object V19Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/results/v19_recall.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.engine.Tables.t(spark, sfDir, "embeddings").persist()
    val n = e.count()
    val allPairs = n * (n - 1) / 2
    import graft.operators.SimilaritySearch
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select("idA", "idB").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilaritySearch.cosineNearDupPairs(
      e, "vec_id", "embedding", threshold = 0.45))
    // ship config first; the two flank configs show the banding dial
    val rows = Seq((24, 6), (16, 4), (16, 8)).map { case (bands, bits) =>
      val nCand = SimilaritySearch.bandedLshNearDupPairs(
        e, "vec_id", "embedding", threshold = -1.0,
        bands = bands, bitsPerBand = bits).count()
      val banded = pairs(SimilaritySearch.bandedLshNearDupPairs(
        e, "vec_id", "embedding", threshold = 0.45,
        bands = bands, bitsPerBand = bits))
      require(banded.subsetOf(exact),
        s"banded pairs must be a subset of the exact arm's: ${banded -- exact}")
      val recall =
        if (exact.isEmpty) 1.0 else banded.intersect(exact).size.toDouble / exact.size
      f"""{"bands":$bands,"bits_per_band":$bits,"candidates":$nCand,"candidate_frac":${nCand.toDouble / allPairs}%.4f,"verified_pairs":${banded.size},"recall_vs_exact":$recall%.4f}"""
    }
    val line =
      f"""{"metric":"v19_recall","sf":"$sfDir","n_vectors":$n,"exact_pairs":${exact.size},"threshold":0.45,"rows":[${rows.mkString(",")}]}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
  }
}
