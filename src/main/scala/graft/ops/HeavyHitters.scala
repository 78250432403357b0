package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-state heavy-hitter detection: mergeable Misra–Gries summaries.
  *
  * The exact face of "which keys dominate" (`a5_value_counts`,
  * `corpus_vocab`) shuffles EVERY distinct key — at 100 TB a token or
  * URL-host column has billions of distinct keys and the group-by IS the
  * cost. Misra–Gries keeps `k` counters per partition (constant memory),
  * and per-partition summaries merge into one summary whose estimates
  * carry the classic guarantee (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS'12):
  *
  *   - `est(x) <= true(x)`  (never overcounts), and
  *   - `true(x) - est(x) <= N / (k+1)`  (undercount bounded by total N),
  *
  * so every key with true count `> N/(k+1)` is GUARANTEED present.
  * The shuffle this plans moves at most `k * numPartitions` summary rows
  * — corpus-size-independent — versus the exact face's full keyspace.
  *
  * Estimates depend on partition layout (any MG summary does), so the
  * oracle-gated face is [[audit]]: it emits only partition-independent
  * facts (the guaranteed-present true heavy hitters + their bound
  * checks), which a SQL engine predicts in closed form.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries in one pass (k counters, O(k) worst-case
    * per row on a miss, amortized O(1): each decrement round is paid for
    * by k+1 prior arrivals). Returns (partition-local) summary rows
    * `(key, est)`, at most k per input partition.
    */
  private def partitionSummaries(keyed: DataFrame, k: Int): DataFrame = {
    import keyed.sparkSession.implicits._
    keyed.select(col("__key").cast("string")).as[String]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { key =>
          counters.get(key) match {
            case Some(c) => counters.update(key, c + 1)
            case None if counters.size < k => counters.update(key, 1L)
            case None =>
              // decrement-all; drop zeros (the Misra–Gries step)
              val dead = scala.collection.mutable.ArrayBuffer.empty[String]
              counters.foreach { case (kk, c) =>
                if (c == 1L) dead += kk else counters.update(kk, c - 1)
              }
              dead.foreach(counters.remove)
          }
        }
        counters.iterator.map { case (kk, c) => (kk, c) }
      }.toDF("__key", "__est")
  }

  /** Merged Misra–Gries summary over `keyCol`: at most `k` candidate
    * rows `(key, est)` with the `N/(k+1)` undercount guarantee intact.
    *
    * Merge rule (Agarwal et al. §3.1): sum per-key estimates across
    * summaries, then subtract the (k+1)-largest summed value and drop
    * non-positives — the decrement total stays <= N/(k+1), so the merged
    * summary is itself a valid MG summary of the concatenated input.
    * Both merge stages run over <= k * numPartitions rows (bounded by
    * construction), so the global window is constant-cost, not a scale
    * hazard.
    */
  def misraGries(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val summed = partitionSummaries(df.select(col(keyCol).as("__key")), k)
      .groupBy(col("__key")).agg(sum(col("__est")).as("__sum"))
    // The offset (the value at rank k+1; 0 when <= k candidates survive)
    // is derived IN the same pipeline via candidate-sized windows — a
    // scalar-subquery formulation would lazily replay the whole scan +
    // sketch a second time (observed in the plan before this was
    // restructured). Both windows sort/scan only the <= k*P candidate
    // rows; the key tiebreak makes rank — and the output — deterministic.
    val byCount = Window.orderBy(col("__sum").desc, col("__key"))
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    summed
      .withColumn("__rk", row_number().over(byCount))
      .withColumn("__off",
        max(when(col("__rk") === k + 1, col("__sum"))).over(all))
      .withColumn("est", col("__sum") - coalesce(col("__off"), lit(0L)))
      .filter(col("est") > 0)
      .select(col("__key").as("key"), col("est"))
  }

  /** Oracle-gated audit: for every TRUE heavy hitter (exact count
    * `> N/(k+1)`), assert it is present in the merged sketch with
    * `0 <= exact - est <= N/(k+1)`. Output rows are the exact heavy
    * hitters with two boolean flags — partition-independent (the
    * guarantee is a theorem, not a measurement), so a SQL oracle
    * predicts them as all-true in closed form. A broken sketch (lost
    * candidate, overcount, blown bound) flips its key's row red.
    */
  def audit(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val keyed = df.select(col(keyCol).cast("string").as("key"))
    val exact = keyed.groupBy(col("key")).agg(count(lit(1)).as("exact_cnt"))
    val n = keyed.agg(count(lit(1)).as("__n"))
    val sketch = misraGries(df, keyCol, k)
      .select(col("key").as("__sk"), col("est"))
    exact.join(broadcast(n), lit(true))
      .filter(col("exact_cnt") * (k + 1) > col("__n"))
      .join(sketch, col("key") === col("__sk"), "left_outer")
      .select(col("key"), col("exact_cnt"),
        col("__sk").isNotNull.as("present_in_sketch"),
        (col("est").isNotNull && col("est") <= col("exact_cnt") &&
          (col("exact_cnt") - col("est")) * (k + 1) <= col("__n"))
          .as("est_within_bound"))
  }
}
