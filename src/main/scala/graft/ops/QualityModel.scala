package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Model-BASED quality filtering, trained inside the engine: a hashed
  * bag-of-words logistic-regression classifier (the fastText-style
  * quality filter of the CCNet/LLaMA lineage — "high-quality reference
  * domains are the positive class, the raw crawl the negative") whose
  * training loop is plain DataFrame aggregates, so it runs where the
  * data lives instead of exporting features to a driver-side learner.
  *
  * Everything is DETERMINISTIC and cross-engine replayable: features are
  * md5-hashed token buckets, the optimizer is full-batch gradient
  * descent with a FIXED iteration count, and every per-iteration
  * quantity (probabilities, gradients, weights) is rounded to the
  * 6-place grid before use, so the DuckDB oracle unrolls the same
  * iterations and lands on bit-identical weights.
  *
  * Scale posture: the (doc, feature, tf) sketch is token-stream-sized,
  * built once and persisted; each iteration is one broadcast join
  * (weights are `dim`-sized — model state never exceeds the feature
  * dimension) + one doc-keyed partial aggregate + one feature-keyed
  * partial aggregate. Iterations are few and fixed (the classifier is a
  * filter, not a research model); cost is O(iters x sketch), linear in
  * the corpus with no corpus-sized driver state.
  */
object QualityModel {

  /** md5-derived feature bucket for a token (stable across engines —
    * the same first-8-hex-digits polynomial as [[Dedup.hashBucket]]).
    */
  private def featureBucket(term: Column, dim: Int): Column =
    (conv(substring(md5(term.cast(StringType)), 1, 8), 16, 10)
      .cast("long") % dim).cast("int")

  /** The persisted training sketch: (doc_id, y, feature, tf) — hashed
    * unigram counts plus the per-document binary label. One corpus scan.
    */
  private[ops] def featureSketch(df: DataFrame, idCol: String,
                                 textCol: String, labelCol: Column,
                                 dim: Int): DataFrame =
    Par.fanOut(df.select(col(idCol), col(textCol), labelCol.as("y")))
      .select(col(idCol), col("y"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .groupBy(col(idCol), col("y"), featureBucket(col("term"), dim).as("feature"))
      .agg(count(lit(1)).as("tf"))

  /** Train `iters` full-batch GD steps from w = 0 and return the weight
    * relation (feature, w). With zero init the first iteration's
    * probabilities are exactly 0.5 for every document, and each
    * subsequent iteration recomputes p from the 6-rounded weights — the
    * oracle replays the identical arithmetic. `labelCol` is the 0/1
    * teacher (e.g. membership in curated sources). Features absent from
    * the corpus simply never appear (implicit weight 0).
    *
    *   p_i   = round(sigmoid(round(sum_f w_f tf_if, 6)), 6)
    *   g_f   = round(sum_i (p_i - y_i) tf_if / n_docs, 6)
    *   w_f  <- round(w_f - lr * g_f, 6)
    */
  def trainHashedLogReg(df: DataFrame, idCol: String, textCol: String,
                        labelCol: Column, dim: Int = 64, lr: Double = 0.5,
                        iters: Int = 3): DataFrame = {
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sk = featureSketch(df, idCol, textCol, labelCol, dim).persist(sl)
    sk.count() // one materialization for all iterations
    val nDocs = sk.select(col(idCol)).distinct().count().toDouble
    // w starts empty (all-zero weights stay implicit; only touched
    // features ever materialize a row — the relation is <= dim rows)
    var w: DataFrame = null
    for (_ <- 0 until iters) {
      val p =
        if (w == null)
          // zero weights: every dot is 0, sigmoid(0) = 0.5 exactly
          sk.select(col(idCol), col("y")).distinct()
            .withColumn("p", lit(0.5))
        else
          sk.join(broadcast(w), Seq("feature"), "left")
            .groupBy(col(idCol), col("y"))
            .agg(round(sum(coalesce(col("w"), lit(0.0)) * col("tf")), 6)
              .as("dot"))
            .withColumn("p",
              round(lit(1.0) / (lit(1.0) + exp(-col("dot"))), 6))
      val grad = sk.join(p.select(col(idCol), col("p")), Seq(idCol))
        .groupBy(col("feature"))
        .agg(round(sum((col("p") - col("y")) * col("tf")) / nDocs, 6)
          .as("g"))
      val prev = if (w == null) grad.select(col("feature"),
        lit(0.0).as("w")) else w
      w = prev.join(grad, Seq("feature"), "outer")
        .select(col("feature"),
          round(coalesce(col("w"), lit(0.0)) -
            lit(lr) * coalesce(col("g"), lit(0.0)), 6).as("w"))
        .localCheckpoint(true) // cut the per-iteration lineage stack
    }
    sk.unpersist()
    w
  }

  /** Score documents under a trained (feature, w) relation: the rounded
    * sigmoid of the rounded dot product, plus the 0/1 prediction at the
    * 0.5 boundary. The broadcast weight join + one doc-keyed aggregate —
    * the corpus streams through once, the filter face is a WHERE on the
    * returned score.
    */
  def scoreHashedLogReg(df: DataFrame, idCol: String, textCol: String,
                        weights: DataFrame, dim: Int = 64): DataFrame =
    Par.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("term"))
      .groupBy(col(idCol), featureBucket(col("term"), dim).as("feature"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(weights), Seq("feature"), "left")
      .groupBy(col(idCol))
      .agg(round(sum(coalesce(col("w"), lit(0.0)) * col("tf")), 6).as("dot"))
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-col("dot"))), 6).as("score"))
      .withColumn("pred",
        when(col("score") >= 0.5, 1).otherwise(0).cast("int"))
}
