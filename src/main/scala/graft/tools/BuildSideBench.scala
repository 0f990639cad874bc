package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 verdict #6: decide the probe-preserving build-side question
  * with data. The reference's rule builds the LEFT side always
  * (`use_parallel_hash_join_rule.rs` — DataFusion convention), so our
  * exec runs `LeftSemi`/`LeftAnti` as build-left + bitset finalizer.
  * Spark convention puts the small dim on the RIGHT, so a faithful
  * build-left semi/anti HASHES THE FACT TABLE — the r9 verdict measured
  * 1.20×/1.28× vs native on the matrix workload.
  *
  * The alternative shape already exists in the exec: swap the children
  * and run the PROBE-preserving kernel (`right_semi.rs` mechanism) —
  * build the small dim, stream the fact, emit matched/unmatched probe
  * rows. Identical semantics and output schema (semi/anti emit only
  * the preserved side), no bitset pass, small hash table.
  *
  *   runMain graft.tools.BuildSideBench [factRows] [dimRows] [reps] [dense|sparse] [chain|open]
  *
  * The 5th arg pins the build-map layout
  * (`spark.graft.parallelHashJoin.map`) so the chain-vs-open default
  * decision (round-10 verdict #6) runs through the same harness.
  *
  * Arms (all shuffled-hash, broadcast disabled):
  *   semi_build_fact   parallelHashJoin(fact, dim, left_semi)  — faithful
  *   semi_build_dim    parallelHashJoin(dim, fact, right_semi) — swapped
  *   semi_native       fact JOIN dim LEFT SEMI via Spark SHJ
  *   anti_*            same three for left_anti
  */
object BuildSideBench {
  def main(args: Array[String]): Unit = {
    val factRows = if (args.nonEmpty) args(0).toLong else 4L * 1024 * 1024
    val dimRows = if (args.length > 1) args(1).toLong else 100000L
    val reps = if (args.length > 2) args(2).toInt else 5
    // 4th arg `sparse`: scramble the join keys so they are no longer a
    // dense 0..2N range — separates "the kernel shape is slower" from
    // "Spark's LongHashedRelation got a dense-array fast path on this
    // fixture" when reading the _vs_native ratios
    val sparse = args.length > 3 && args(3) == "sparse"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(4).headOption.foreach { layout =>
      spark.conf.set(graft.plans.ParallelHashJoinExec.mapImplKey, layout)
      println(s"""{"map_layout":"$layout"}""")
    }

    // fact keys cover 2× the dim domain → ~50% semi survival, ~50% anti
    def scramble(c: org.apache.spark.sql.Column) =
      if (sparse) c * lit(2654435761L) else c
    val fact = spark.range(0, factRows, 1, 64)
      .select(scramble(col("id") % (dimRows * 2)).as("k"), (col("id") % 1000).as("v"))
      .cache()
    val dim = spark.range(0, dimRows, 1, 8)
      .select(scramble(col("id")).as("d_k"), (col("id") * 7 % 100).as("d_v")).cache()
    fact.count(); dim.count()

    def time(label: String)(mk: () => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val best = (1 to reps).map(_ => once()).min
      println(f"""{"metric":"$label","value":$best%.3f,"unit":"sec","fact":$factRows,"dim":$dimRows}""")
      best
    }

    import graft.plans.ParallelHashJoinApi.parallelHashJoin
    // fidelity shape: build = left = FACT (bitset finalizer over 4M rows)
    val sbf = time("semi_build_fact")(() =>
      parallelHashJoin(fact, dim, Seq("k"), Seq("d_k"), "left_semi"))
    // swapped shape: build = left = DIM, stream fact (probe-preserving)
    val sbd = time("semi_build_dim")(() =>
      parallelHashJoin(dim, fact, Seq("d_k"), Seq("k"), "right_semi"))
    val sn = time("semi_native")(() =>
      fact.hint("SHUFFLE_HASH").join(dim, col("k") === col("d_k"), "left_semi"))
    val abf = time("anti_build_fact")(() =>
      parallelHashJoin(fact, dim, Seq("k"), Seq("d_k"), "left_anti"))
    val abd = time("anti_build_dim")(() =>
      parallelHashJoin(dim, fact, Seq("d_k"), Seq("k"), "right_anti"))
    val an = time("anti_native")(() =>
      fact.hint("SHUFFLE_HASH").join(dim, col("k") === col("d_k"), "left_anti"))
    println(f"""{"semi_swap_speedup":${sbf / sbd}%.2f,"anti_swap_speedup":${abf / abd}%.2f,"semi_vs_native":${sbd / sn}%.2f,"anti_vs_native":${abd / an}%.2f}""")
    spark.stop()
  }
}
