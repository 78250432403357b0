package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge lists — the relational PageRank
  * (Page et al. 1999, the unnormalized `(1-d) + d*Σ rank/deg` form).
  *
  * The iterative pattern is the 100 TB hazard here, not the math: each
  * step is join(edges, ranks) → groupBy(dst), and naively chaining 10 of
  * those builds a 10-deep lazy lineage that Catalyst re-analyzes and the
  * scheduler re-executes from the scan on any retry. Every iteration
  * therefore cuts lineage with an EAGER `localCheckpoint` — on a real
  * cluster this is `checkpoint` into the reliable store (or a persisted
  * intermediate table) every few rounds, plus edges bucketed by `src` so
  * the per-iteration join never reshuffles the (static, large) edge set;
  * only the (node-sized) rank vector moves.
  *
  * Determinism across engines and shuffle orders: each contribution
  * `rank/deg` snaps to the 1e-12 grid and accumulates as an exact
  * DECIMAL(28,12) sum, so the float arithmetic per iteration is a fixed
  * op sequence on identical inputs — a DuckDB oracle unrolling the same
  * recurrence lands on identical bits (the repo's EWMA/centroid rule).
  */
object Graph {

  /** `edges`: directed (src, dst) rows, pre-deduplicated by the caller
    * (symmetrize for an undirected walk). Every node must have at least
    * one OUT-edge (true for symmetrized graphs); nodes with no in-edges
    * still receive the teleport mass via the left join. Returns
    * (node, rank) with rank on the 1e-6 grid.
    */
  def pagerank(edges: DataFrame, iterations: Int,
      teleport: Double = 0.15, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    // static per-edge (src, dst, deg) — computed once, reused per
    // iteration, never re-derived from the scan
    val ed = e.join(deg, "src").localCheckpoint(true)
    var ranks = deg.select(col("src").as("node"), lit(1.0).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = ed.join(ranks, col("src") === col("node"))
        .select(col("dst"),
          round(col("rank") / col("deg"), 12)
            .cast("decimal(28,12)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = deg.join(contribs, col("src") === col("dst"), "left")
        .select(col("src").as("node"),
          round(lit(teleport) + lit(damping) *
            coalesce(col("s"), lit(0).cast("decimal(38,12)"))
              .cast("double"), 12).as("rank"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
