package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.VectorFunctions

/** Reusable similarity-search APIs over an embedding column
  * (`Array[Float]`) — the library surface behind the fixed demo
  * queries (`v1_cosine_topk`, `v2_ann_lsh`, `v4_embedding_neardup`):
  * a pipeline user points these at their own (id, vector) tables.
  *
  * Scale posture matches the query implementations. Query-vs-corpus
  * scoring broadcasts the single query row and streams the corpus in
  * one codegen'd pass (`DotProduct`/`VectorNorm` custom expressions —
  * no intermediate arrays, norms computed once per row). LSH bucketing
  * is the >1M-vector path: candidates come only from the query's
  * signature bucket (~N/2^bits of the corpus). Exact pairwise near-dup
  * is triangle-blocked so the inherent O(N²) flops spread over
  * O(B²) tasks with nothing on the driver; beyond ~1M vectors the
  * honest answer is LSH-bucketed pairing instead.
  *
  * Cosines are rounded half-up to 4 decimals (`floor(x·10⁴+0.5)/10⁴`,
  * raw double arithmetic) so scores, thresholds, and orderings are
  * bit-reproducible across engines and re-runs — the same contract the
  * oracle-gated queries verify against DuckDB.
  */
object SimilaritySearch {

  private def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000.0

  /** Cosine of every corpus row against the single-row `query`
    * DataFrame (broadcast). Returns (idCol, cos_sim), unordered —
    * compose with your own ranking or thresholding.
    * `query` must have exactly one row; its vector column is
    * `queryVecCol`. */
  def cosineScores(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String): DataFrame = {
    implicit val sp: SparkSession = corpus.sparkSession
    val q = query.select(col(queryVecCol).as("__qe"),
      VectorFunctions.norm(col(queryVecCol)).as("__qn"))
    corpus.crossJoin(broadcast(q))
      .select(col(idCol),
        r4(VectorFunctions.dot(col(vecCol), col("__qe")) /
          (VectorFunctions.norm(col(vecCol)) * col("__qn"))).as("cos_sim"))
  }

  /** Exact brute-force cosine top-k: the correctness baseline for ANN.
    * Deterministic ordering (score desc, then id). */
  def cosineTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      k: Int): DataFrame =
    cosineScores(corpus, idCol, vecCol, query, queryVecCol)
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)

  /** Random-hyperplane LSH signature: bit p of the result is the sign
    * of the vector's projection onto pseudo-hyperplane p, whose ±1
    * weights derive from md5 of (p, component index) — deterministic
    * across engines, machines, and re-runs, so bucketing is stable on
    * re-ingest (and SQL-replayable, which is how `v2_ann_lsh` stays on
    * the hash-exact oracle gate). */
  def lshSignature(vecCol: String, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
    (0 until bits).map { p =>
      val proj = expr(
        s"""aggregate(zip_with($vecCol, sequence(0, size($vecCol) - 1),
           |  (x, i) -> CAST(x AS DOUBLE) *
           |    (CASE WHEN CAST(conv(substr(md5(concat('$p', '_', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2 = 0
           |     THEN 1.0 ELSE -1.0 END)),
           |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN candidates via LSH bucketing: corpus rows whose signature
    * equals the query's, scored by exact cosine. Returns
    * (idCol, sig, cos_sim) unordered; compose with ranking for top-k.
    * Expected candidate set is ~N/2^bits — the fraction of the corpus
    * a query touches at 100 TB. */
  def lshCandidates(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      bits: Int = 8): DataFrame = {
    implicit val sp: SparkSession = corpus.sparkSession
    val sig = lshSignature(vecCol, bits)
    val qSig = lshSignature(queryVecCol, bits)
    val q = query.select(col(queryVecCol).as("__qe"),
      qSig.as("__qsig"),
      VectorFunctions.norm(col(queryVecCol)).as("__qn"))
    corpus
      .select(col(idCol), col(vecCol),
        sig.cast(LongType).as("sig"),
        VectorFunctions.norm(col(vecCol)).as("__nrm"))
      .join(broadcast(q), col("sig") === col("__qsig"))
      .select(col(idCol), col("sig"),
        r4(VectorFunctions.dot(col(vecCol), col("__qe")) /
          (col("__nrm") * col("__qn"))).as("cos_sim"))
  }

  /** Exact cosine near-duplicate pairs: (idA, idB, cos_sim) with
    * idA < idB and rounded cosine ≥ `threshold`.
    *
    * Triangle-blocked distributed all-pairs: each vector lands in
    * block id % numBlocks; each of the B·(B+1)/2 block pairs (p ≤ q)
    * is one shuffle group whose task sees exactly two blocks and runs
    * the tight pairwise kernel (double-accumulated dot, fixed loop
    * order, so scores are bit-exact). Replication factor B, task
    * memory 2·N/B vectors, nothing on the driver. At 100 TB size B so
    * two blocks fit an executor (B ≈ N·vecBytes / targetBlockBytes).
    * O(N²) flops are inherent to EXACT pairwise — use LSH bucketing
    * beyond ~1M vectors. */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numBlocks: Int = 8): DataFrame = {
    require(numBlocks >= 1, s"numBlocks must be positive, got $numBlocks")
    val sp = corpus.sparkSession
    import sp.implicits._
    val base = corpus.select(col(idCol), col(vecCol)).as[(Long, Array[Float])]
    // replicate each row to every block pair it participates in:
    // tag 0 = same-block group, 1 = left block of (p,q), 2 = right block
    val tagged = base.flatMap { case (id, vec) =>
      val b = (id % numBlocks).toInt
      Iterator.single((b, b, 0.toByte, id, vec)) ++
        Iterator.range(b + 1, numBlocks).map(q => (b, q, 1.toByte, id, vec)) ++
        Iterator.range(0, b).map(p => (p, b, 2.toByte, id, vec))
    }
    def dotd(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var k = 0
      while (k < x.length) { d += x(k).toDouble * y(k).toDouble; k += 1 }
      d
    }
    def nrm(x: Array[Float]): Double = math.sqrt(dotd(x, x))
    // same floor-based half-up rounding as r4 (raw double arithmetic,
    // bit-identical across engines)
    def score(a: (Long, Array[Float], Double), b: (Long, Array[Float], Double)) =
      math.floor(dotd(a._2, b._2) / (a._3 * b._3) * 10000 + 0.5) / 10000.0
    val pairs = tagged
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Int, Int), rows: Iterator[(Int, Int, Byte, Long, Array[Float])]) =>
        val (p, q) = key
        val aSide = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
        val bSide = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
        rows.foreach { case (_, _, tag, id, vec) =>
          val entry = (id, vec, nrm(vec))
          if (tag == 0.toByte || tag == 1.toByte) aSide += entry
          if (tag == 2.toByte) bSide += entry
        }
        if (p == q) {
          // within-block: ordered pairs by id
          val sorted = aSide.sortBy(_._1)
          for {
            i <- sorted.indices.iterator
            j <- (i + 1 until sorted.length).iterator
            cos = score(sorted(i), sorted(j))
            if cos >= threshold
          } yield (sorted(i)._1, sorted(j)._1, cos)
        } else {
          // cross-block: full A×B, pair reported (smaller id, larger id)
          for {
            a <- aSide.iterator
            b <- bSide.iterator
            cos = score(a, b)
            if cos >= threshold
          } yield if (a._1 < b._1) (a._1, b._1, cos) else (b._1, a._1, cos)
        }
      }
    pairs.toDF("idA", "idB", "cos_sim")
  }
}
