package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive/algebraic aggregates —
  * maintain a grouped summary under appended deltas WITHOUT rescanning
  * history (Gray et al. 1997's distributive/algebraic classification;
  * the partial-aggregate algebra Spark itself uses map-side).
  *
  * The 100 TB story is the whole point: a daily gold refresh that
  * re-aggregates the full fact history scans the entire corpus every
  * day; with mergeable partials the daily cost is one scan of the DELTA
  * plus a group-sized merge — the historical partials relation is
  * group-cardinality-sized, not fact-sized. count/sum/min/max merge
  * directly; avg is derived from (count, sum) at READ time (never
  * stored — stored averages don't merge); the same algebra carries
  * any algebraic aggregate whose partial state is bounded.
  *
  * Determinism: input values are cast to exact DECIMAL(18,4) and the
  * sums Spark widens to DECIMAL(28,4) at the partial tier and
  * DECIMAL(38,4) at the merge tier (the repo's decimal-accumulation
  * rule), so merge order cannot move a bit; doubles appear only at the
  * rounded read-time boundary. Headroom: a single input value must fit
  * 14 integer digits, a single partial's group sum 24, the merged sum
  * 34 — beyond that Spark nulls the sum rather than rounding it.
  */
object Ivm {

  /** Mergeable partials of `valueCol` per `groupCols`: (n, sum_v as
    * exact decimal, min_v, max_v). Run over a base load once, then over
    * each delta — never over history again.
    */
  def partials(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol).cast("decimal(18,4)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge any number of partials relations into one — the same-shaped
    * relation, so merging is closed (partials(base) ⊕ partials(delta1)
    * ⊕ ... associatively, in any order).
    */
  def merge(parts: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** The read-time face: derived columns (avg) + rounded doubles at the
    * presentation boundary.
    */
  def readView(merged: DataFrame): DataFrame =
    merged.select(
      merged.columns.filterNot(
        Seq("n", "sum_v", "min_v", "max_v").contains).map(col) ++ Seq(
        col("n"),
        round(col("sum_v").cast("double"), 6).as("sum_v"),
        round(col("min_v").cast("double"), 6).as("min_v"),
        round(col("max_v").cast("double"), 6).as("max_v"),
        round(col("sum_v").cast("double") / col("n"), 6).as("avg_v")): _*)
}
