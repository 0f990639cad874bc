package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: grow-the-data evidence. Synthesizes an sf{0.1*N} dataset
  * from sf0.1 by unioning N key-shifted replicas of every table, so the
  * expensive queries can be soaked at ~sf1 locally and their scaling
  * exponents measured (round-4 verdict item #8).
  *
  * Replication preserves the join topology (every FK is shifted by the
  * same per-replica stride as its PK) and — crucially for the dedup /
  * ANN workloads — does NOT create cross-replica near-duplicates:
  * document words are vocabulary-tagged per replica and embeddings are
  * cyclically component-rotated per replica (see the inline comment on
  * the embeddings block for why the earlier additive offset was a
  * degenerate corpus), so posting lists, LSH buckets and pair counts
  * scale like real data instead of exploding into N-cliques of
  * self-copies. Caveat: at reps > dim, rotation amounts wrap (replica
  * dim+i repeats replica i's rotation) — those replica pairs are exact
  * copies of each other, i.e. the corpus gains a controlled dose of
  * true duplicates, which real crawls have anyway.
  *
  *   runMain graft.tools.ScaleUp [srcDir] [reps] [outDir]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val out = if (args.length > 2) args(2) else "/tmp/graft_sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    /** Union of `reps` copies, each transformed by `f(df, replicaIdx)`. */
    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps).map(i => f(df, i)).reduce(_ unionAll _)
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).first.getLong(0) + 1

    // dims shared by all replicas
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    val cust = rd("customer"); val custS = stride(cust, "c_custkey")
    wr(replicate(cust)((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * custS))), "customer")

    val supp = rd("supplier"); val suppS = stride(supp, "s_suppkey")
    wr(replicate(supp)((d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppS))), "supplier")

    val part = rd("part"); val partS = stride(part, "p_partkey")
    wr(replicate(part)((d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * partS))), "part")

    val ord = rd("orders"); val ordS = stride(ord, "o_orderkey")
    wr(replicate(ord)((d, i) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * ordS))
      .withColumn("o_custkey", col("o_custkey") + lit(i * custS))), "orders")

    wr(replicate(rd("lineitem"))((d, i) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * ordS))
      .withColumn("l_partkey", col("l_partkey") + lit(i * partS))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppS))), "lineitem")

    val ev = rd("events")
    val evS = stride(ev, "event_id"); val userS = stride(ev, "user_id")
    wr(replicate(ev)((d, i) => d
      .withColumn("event_id", col("event_id") + lit(i * evS))
      .withColumn("user_id", col("user_id") + lit(i * userS))), "events")

    val docs = rd("documents"); val docS = stride(docs, "doc_id")
    wr(replicate(docs)((d, i) => d
      .withColumn("doc_id", col("doc_id") + lit(i * docS))
      // replica 0 keeps the original text; others get a disjoint
      // vocabulary (same word count / length distribution) so shingle
      // and token workloads scale without cross-replica near-dups
      .withColumn("text", if (i == 0) col("text")
        else concat_ws(" ", expr(s"transform(split(text, ' '), w -> concat('r$i', w))")))),
      "documents")

    val emb = rd("embeddings"); val vecS = stride(emb, "vec_id")
    wr(replicate(emb)((d, i) => d
      .withColumn("vec_id", col("vec_id") + lit(i * vecS))
      // replica i CYCLICALLY ROTATES every vector's components by i.
      // Rotation is orthogonal, so WITHIN a replica pairwise cosines
      // equal the originals (exactly for the integer quantized scores;
      // for float kernels up to summation-ORDER ulps, since the dot
      // product now starts at a different offset — a pair sitting
      // within an ulp of an r4 rounding boundary can in principle flip
      // across a threshold in one replica only). Each replica thus
      // contributes the base corpus's near-dup pairs — honest 10×
      // output for 10× data — while ACROSS replicas cosine is the
      // base vectors' lag-i autocorrelation ≈ random-pair level. The
      // previous additive ±0.037i shift gave every cross-replica pair
      // a shared perturbation component: at reps=10 it made 54% of ALL
      // pairs (~10⁸ at sf1) clear a 0.45 near-dup threshold — a
      // degenerate corpus in which any candidate prefilter is
      // worthless and pair-output volume, not kernel scaling, is what
      // soaks measured. No arithmetic: the floats are copied verbatim.
      .withColumn("embedding", if (i == 0) col("embedding")
        else expr(s"transform(sequence(0, size(embedding) - 1), " +
          s"j -> embedding[(j + $i) % size(embedding)])"))),
      "embeddings")

    println(s"[scaleup] wrote ${reps}x $src -> $out")
    spark.stop()
  }
}
