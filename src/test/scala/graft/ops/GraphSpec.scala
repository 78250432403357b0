package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(String, String)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("a regular graph is an exact fixed point at rank 1.0") {
    // 4-cycle: every node has degree 2 -> sum of rank/deg over the two
    // in-neighbors is exactly 1, and 0.15 + 0.85*1 = 1.0 forever
    val cycle = sym(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")))
    val out = Graph.pagerank(cycle, iterations = 5).collect()
    assert(out.length == 4 && out.forall(_.getDouble(1) == 1.0))
  }

  test("star graph: hub outranks leaves, teleport mass is the floor") {
    val star = sym(Seq(("hub", "l1"), ("hub", "l2"), ("hub", "l3")))
    val r = Graph.pagerank(star, iterations = 8)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("l1") && r("l1") == r("l2") && r("l2") == r("l3"))
    assert(r.values.forall(_ >= 0.15))
    // total rank stays near n (teleport + damping conserve mass on a
    // symmetrized graph up to the per-step rounding)
    assert(math.abs(r.values.sum - 4.0) < 0.01)
  }

  test("deterministic across runs (decimal accumulation, no float drift)") {
    val g = sym(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")))
    val r1 = Graph.pagerank(g, 6).collect().map(r =>
      r.getString(0) -> r.getDouble(1)).toMap
    val r2 = Graph.pagerank(g.repartition(7), 6).collect().map(r =>
      r.getString(0) -> r.getDouble(1)).toMap
    assert(r1 == r2)
  }

  test("a node with no in-edges still receives the teleport rank") {
    // directed: a -> b only; a has out-degree 1 but no in-edges
    val g = Seq(("a", "b"), ("b", "a"), ("a", "c")).toDF("src", "dst")
    // c has no out-edge: drop it from the walk by filtering to nodes
    // with out-edges (the operator's contract) — keep a and b
    val withOut = g.filter(col("src").isin("a", "b"))
    val r = Graph.pagerank(withOut, 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.contains("a") && r.contains("b"))
    assert(r("a") >= 0.15 && r("b") >= 0.15)
  }

  private def ed(pairs: (Long, Long)*) =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("a", "b")

  test("k-core peel strips the pendant chain and keeps the clique") {
    // K4 {1,2,3,4} + chain 4-5-6: the chain must peel away over two
    // rounds (6 first, then 5), leaving exactly the 3-core K4
    val g = ed(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 4L -> 5L, 5L -> 6L)
    val core = Graph.kcorePeel(g, 3, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // converged: more rounds change nothing
    val more = Graph.kcorePeel(g, 3, 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == core)
    // k above the max degree empties the graph
    assert(Graph.kcorePeel(g, 5, 8).count() == 0)
  }

  test("bfs distances: shortest hop counts, bounded horizon") {
    // path 1-2-3-4-5-6 plus shortcut 1-4: node 4 is 1 hop, 5 is 2, 6 is 3
    val g = ed(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 1L -> 4L)
    val d = Graph.bfsDistances(g, 1L, 4).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2, 6L -> 3))
    // horizon 1: only direct neighbors
    val d1 = Graph.bfsDistances(g, 1L, 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d1 == Map(1L -> 0, 2L -> 1, 4L -> 1))
    // disconnected node never appears
    val g2 = ed(1L -> 2L, 8L -> 9L)
    val d2 = Graph.bfsDistances(g2, 1L, 4).collect().map(_.getLong(0)).toSet
    assert(d2 == Set(1L, 2L))
  }
}
