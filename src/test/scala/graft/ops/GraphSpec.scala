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
}
