package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Graph.pageRank must match an independent single-threaded
  * reimplementation of the same integer fixed-point recurrence
  * bit-for-bit (that exactness is what puts it on the hash-exact
  * oracle gate), rank structurally sensible graphs correctly, and
  * leave no cached blocks behind. */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference model: same recurrence, plain Scala Maps, sequential. */
  private def model(
      edges: Seq[(Long, Long)], iters: Int,
      dampingPct: Long = 85L, scale: Long = 1000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (100L - dampingPct) * scale / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 0 until iters) {
      val contrib = edges
        .filter { case (s, _) => deg.getOrElse(s, 0L) > 0 }
        .map { case (s, d) => d -> r(s) / deg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(n => n -> (base + dampingPct * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
  }

  test("pageRank matches the sequential integer model bit-for-bit") {
    // cycle + chord + dangling sink: exercises shares, damping floor
    // division, and mass decay through node 5 (no out-edges)
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (3L, 5L))
    for (iters <- Seq(1, 3, 7)) {
      assert(run(edges, iters) == model(edges, iters), s"iters=$iters")
    }
  }

  test("hub of a star graph gets the highest rank") {
    val spokes = (1L to 20L).map(i => (i, 100L)) // all point at the hub
    val back = (1L to 20L).map(i => (100L, i))   // hub points back
    val ranks = run(spokes ++ back, iters = 3)
    val hub = ranks(100L)
    assert((1L to 20L).forall(i => ranks(i) < hub))
    assert(ranks == model(spokes ++ back, 3))
  }

  test("parallel edges weight the destination (caller-owned dedup)") {
    val ranks = run(Seq((1L, 2L), (1L, 2L), (1L, 3L)), iters = 2)
    assert(ranks(2L) > ranks(3L))
  }

  test("pageRank leaves no cached plans behind") {
    import spark.implicits._
    spark.catalog.clearCache()
    val edges = (1L to 50L).map(i => (i, (i % 7) + 1L)).toDF("src", "dst")
    Graph.pageRank(edges, iters = 4).count()
    assert(org.apache.spark.sql.classic.GraftSqlBridge.cacheIsEmpty(spark))
  }

  test("iters and damping bounds are validated") {
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, iters = 0))
    intercept[IllegalArgumentException](Graph.pageRank(e, dampingPct = 101))
  }
}
