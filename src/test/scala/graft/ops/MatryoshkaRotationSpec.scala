package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The trained-rotation protocol for prefix-dimension (Matryoshka-style)
  * truncation (r16 verdict task 2): measure recall@10 of the 16/32-dim
  * PREFIX against the full-dim exact top-10, with and without a trained
  * front-end, and adopt/reject on the measurement (the OPQ/cascade
  * discipline). Three contenders:
  *   - plain truncation (the r16 baseline: 0.20 / 0.34 insample sf0.01),
  *   - variance-descending permutation ([[Similarity.varianceOrder]] —
  *     the declared oracle-gated query),
  *   - dense PCA rotation ([[Similarity.pcaRotation]] — covariance
  *     eigenvectors, descending eigenvalue).
  * The numbers of record live in BASELINE.md; this spec pins the
  * INVARIANTS that must hold on any corpus: the PCA prefix can only
  * help (it maximizes retained variance among linear maps), and the
  * full-dim rotated ranking is the exact ranking (orthogonal rotation
  * preserves cosine up to the 1e-6 rotation grid).
  */
class MatryoshkaRotationSpec extends SparkSpec {

  private def meanRecall(emb: DataFrame, exact: DataFrame, d: Int): Double =
    Similarity.recallAtK(
        Similarity.bruteForceTopK(
          emb.select(col("vec_id"), slice(col("embedding"), 1, d).as("embedding")),
          col("vec_id") % 100 === 0, k = 10),
        exact, k = 10)
      .agg(avg(col("recall"))).head().getDouble(0)

  test("PCA rotation lifts prefix recall; full-dim rotated ranking stays exact") {
    val e = Tables.embeddings(spark, sf0001)
    val exact = Similarity.bruteForceTopK(e, col("vec_id") % 100 === 0, k = 10)
    val rot = Similarity.rotate(e, Similarity.pcaRotation(e, 64))
      .localCheckpoint(true)
    val perm = Similarity.varianceOrder(e, 64)
    val permuted = e.select(col("vec_id"),
      array(perm.toIndexedSeq.map(i => col("embedding").getItem(i)): _*)
        .as("embedding"))
    for (d <- Seq(16, 32)) {
      val plain = meanRecall(e, exact, d)
      val axis = meanRecall(permuted, exact, d)
      val pca = meanRecall(rot, exact, d)
      info(f"d=$d%2d recall@10: plain=$plain%.3f variance-perm=$axis%.3f pca=$pca%.3f")
      // the PCA prefix retains maximal variance among rank-d linear
      // projections; on any non-degenerate corpus it must not lose to
      // plain truncation (equality possible on isotropic data)
      assert(pca >= plain,
        s"d=$d: pca=$pca < plain=$plain — rotation must not hurt")
    }
    // full-dim sanity: rotation preserves the ranking itself (grid
    // rounding can only flip genuinely sub-1e-5 score ties)
    val full = Similarity.bruteForceTopK(rot, col("vec_id") % 100 === 0, k = 10)
    val a = full.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = exact.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree = a.intersect(b).size.toDouble / b.size
    assert(agree >= 0.98, s"full-dim rotated ranking drifted: $agree")
  }
}
