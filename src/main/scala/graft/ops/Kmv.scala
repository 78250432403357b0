package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the
  * KMV/theta-sketch family, Beyer et al. 2007 for the unbiased
  * estimator and set operations) — a SMALL, MERGEABLE, cross-engine
  * DETERMINISTIC summary of a distinct set.
  *
  * Why alongside HLL (`approx_count_distinct`, used by
  * `corpus_data_card_sketch`): HLL estimates sizes only; a KMV sketch
  * is a uniform hash SAMPLE of the distinct set, so two sketches
  * support set operations — Jaccard and intersection estimates between
  * corpus slices the engines can gate on without ever joining the
  * slices. And unlike HLL register layouts (engine-private), KMV is
  * pure relational algebra on md5: DuckDB rebuilds the IDENTICAL
  * sketch, so the estimate itself hash-gates across engines — the
  * repo's strongest correctness tier, applied to an approximation.
  *
  * Scale shape: the distinct pass is one map-side-combined shuffle of
  * fixed-width (slice, hash) rows; the k-smallest step is a sort-based
  * window (external sort — spills, never buffers a group in memory,
  * unlike `percentile`'s in-memory group buffer) over the per-slice
  * DISTINCT hashes, emitting k rows per slice. [[sketchSalted]] is the
  * further rung for billion-distinct slices — the salt-two-phase
  * refinement, bit-identical by the k-minimum merge property.
  */
object Kmv {

  /** The shared 32-bit hash convention (`Dedup.hashBucket` without the
    * mod): first 8 md5 hex digits as a long in [0, 2^32).
    */
  def hash32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast(StringType)), 1, 8), 16, 10).cast("long")

  /** Per-slice KMV sketch: the `k` smallest distinct key hashes, as
    * `(slice, pos, h)` with pos = 1..k ascending. Slices with fewer
    * than k distinct keys keep them all (the sketch IS the set there).
    */
  def sketch(df: DataFrame, sliceCol: String, keyCol: String,
      k: Int): DataFrame = {
    val d = df.select(col(sliceCol).as("slice"),
        hash32(col(keyCol)).as("h"))
      .filter(col("slice").isNotNull)
      .distinct()
    val w = Window.partitionBy(col("slice")).orderBy(col("h"))
    d.withColumn("pos", row_number().over(w))
      .filter(col("pos") <= k)
      .select(col("slice"), col("pos"), col("h"))
  }

  /** Two-phase salted variant of [[sketch]] for billion-distinct
    * slices: phase 1 takes the k smallest within each (slice, h % 32)
    * salt partition — 32 bounded windows instead of one slice-wide
    * sort — and phase 2 re-selects the k smallest of the ≤ 32k
    * survivors. IDENTICAL output to [[sketch]] by construction: every
    * global k-minimum is a k-minimum of its own salt partition (fewer
    * than k hashes sit below it globally, so fewer do in its
    * partition) — the same merge property [[graft.streaming.KmvIngest]]
    * relies on, applied spatially instead of temporally. Spec-pinned
    * bit-for-bit equal.
    */
  def sketchSalted(df: DataFrame, sliceCol: String, keyCol: String,
      k: Int, salts: Int = 32): DataFrame = {
    val d = df.select(col(sliceCol).as("slice"),
        hash32(col(keyCol)).as("h"))
      .filter(col("slice").isNotNull)
      .distinct()
      .withColumn("salt", pmod(col("h"), lit(salts)))
    val w1 = Window.partitionBy(col("slice"), col("salt")).orderBy(col("h"))
    val survivors = d.withColumn("p1", row_number().over(w1))
      .filter(col("p1") <= k)
    val w2 = Window.partitionBy(col("slice")).orderBy(col("h"))
    survivors.withColumn("pos", row_number().over(w2))
      .filter(col("pos") <= k)
      .select(col("slice"), col("pos"), col("h"))
  }

  /** Distinct-count estimates off a [[sketch]]: `(slice, n_seen, est)`.
    * With n_seen < k the sketch holds the whole distinct set and the
    * estimate is exact; otherwise est = (k-1) · 2^32 / (h_k + 1) — the
    * standard KMV estimator on the integer hash scale (the +1 guards
    * h = 0 and is shared by both engines, so determinism holds).
    */
  def distinctEstimate(sk: DataFrame, k: Int): DataFrame =
    sk.groupBy(col("slice"))
      .agg(count(lit(1)).as("n_seen"),
        max(when(col("pos") === k, col("h"))).as("hk"))
      .select(col("slice"), col("n_seen"),
        when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(4294967296.0) /
            (col("hk") + 1).cast("double"), 6)).as("est"))

  /** All-pairs overlap matrix from ONE sketch relation: [[overlapEstimate]]
    * for every unordered slice pair simultaneously, fully relationally —
    * tag each sketch row into every pair it participates in (slice-pair
    * cross of k-row sketches: |slices|²·k rows, sketch-sized not
    * corpus-sized), merge per pair, re-rank, estimate. The audiences
    * themselves are never touched: the entire |slices|×|slices| overlap
    * report costs a few thousand rows of arithmetic.
    */
  def overlapMatrix(sk: DataFrame, k: Int): DataFrame = {
    val a = sk.select(col("slice").as("slice_a"), col("h"))
    val b = sk.select(col("slice").as("slice_b"), col("h").as("hb"))
    val slices = sk.select(col("slice")).distinct()
    val pairs = slices.select(col("slice").as("slice_a"))
      .join(slices.select(col("slice").as("slice_b")),
        col("slice_a") < col("slice_b"))
    val tagged = pairs.join(a, Seq("slice_a"))
      .withColumn("in_a", lit(1)).withColumn("in_b", lit(0))
      .unionByName(pairs.join(b.withColumnRenamed("hb", "h"), Seq("slice_b"))
        .withColumn("in_a", lit(0)).withColumn("in_b", lit(1)))
      .groupBy(col("slice_a"), col("slice_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("slice_a"), col("slice_b"))
      .orderBy(col("h"))
    tagged.withColumn("pos", row_number().over(w))
      .filter(col("pos") <= k)
      .groupBy(col("slice_a"), col("slice_b"))
      .agg(count(lit(1)).as("n_merged"),
        sum(col("in_a") * col("in_b")).as("n_both"),
        max(when(col("pos") === k, col("h"))).as("hk"))
      .select(col("slice_a"), col("slice_b"), col("n_both"),
        round(col("n_both").cast("double") / col("n_merged"), 6)
          .as("jaccard_est"),
        round((col("n_both").cast("double") / col("n_merged")) *
          when(col("n_merged") < k, col("n_merged").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
              (col("hk") + 1).cast("double")), 6).as("intersection_est"))
  }

  /** Jaccard + intersection estimate between two slices of one sketch
    * relation, the Beyer et al. combined-sketch rule: K = the k
    * smallest hashes of sketchA ∪ sketchB; J = |{h ∈ K: h in both
    * sketches}| / k; |A∩B| ≈ J · D(A∪B) where D comes from K's k-th
    * value. Everything is arithmetic on the two k-row sketches — the
    * underlying slices are never rejoined, and the one global window
    * below runs over at most 2k rows by construction.
    */
  def overlapEstimate(sk: DataFrame, sliceA: String, sliceB: String,
      k: Int): DataFrame = {
    val a = sk.filter(col("slice") === sliceA).select(col("h"))
    val b = sk.filter(col("slice") === sliceB).select(col("h"))
    val tagged = a.withColumn("in_a", lit(1)).withColumn("in_b", lit(0))
      .unionByName(b.withColumn("in_a", lit(0)).withColumn("in_b", lit(1)))
      .groupBy(col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.orderBy(col("h"))
    val merged = tagged.withColumn("pos", row_number().over(w))
      .filter(col("pos") <= k)
    merged.agg(count(lit(1)).as("n_merged"),
        sum(col("in_a") * col("in_b")).as("n_both"),
        max(when(col("pos") === k, col("h"))).as("hk"))
      .select(
        lit(sliceA).as("slice_a"), lit(sliceB).as("slice_b"),
        col("n_both"),
        round(col("n_both").cast("double") / col("n_merged"), 6)
          .as("jaccard_est"),
        round((col("n_both").cast("double") / col("n_merged")) *
          when(col("n_merged") < k, col("n_merged").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
              (col("hk") + 1).cast("double")), 6).as("intersection_est"))
  }
}
