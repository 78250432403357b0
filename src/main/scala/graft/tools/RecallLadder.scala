package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: ANN recall ladder sweep. Measures mean recall@10 of the
  * IVF-PQ configurations (seeded / learned-PQ / fully-learned, each with
  * and without the exact-cosine rerank stage) across a range of `nprobe`
  * values — the tuning loop behind picking the served configuration.
  *
  * Two query sets are swept per rung: `insample` (vec_id % 100 == 0 — the
  * repo's oracle convention; a strict SUBSET of the % 50 centroid seeds, so
  * its recall is optimistically biased: every query is its own IVF centroid
  * and a k-means init point) and `holdout` (vec_id % 100 == 7 — disjoint
  * from the seeds, the honest out-of-sample number to tune on).
  *
  * Usage: runMain graft.tools.RecallLadder <sfDir> [nprobe,nprobe,...]
  */
object RecallLadder {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = args.head
    val nprobes: Seq[Int] =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(3, 4, 5, 6, 8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", graft.Bench.scratchDir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding")).persist()
    e.count()
    // (predicate name, query set, exact ground truth) — insample matches the
    // oracle convention; holdout is disjoint from the centroid seeds.
    val querySets: Seq[(String, DataFrame, DataFrame)] =
      Seq(("insample", col("vec_id") % 100 === 0),
        ("holdout", col("vec_id") % 100 === 7)).map { case (qn, pred) =>
        val exact = Similarity.bruteForceTopK(e, pred, k = 10).persist()
        exact.count()
        (qn, e.filter(pred), exact)
      }

    val seed = e.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding")
    // the three codebook configurations on the ladder
    val seedPq = Similarity.pqCodebook(e, m = 4, dim = 64, centroidMod = 50)
      .persist()
    seedPq.count()
    val learnedPq = Similarity.pqCodebookLearned(e, m = 4, dim = 64,
      centroidMod = 50, maxIters = 2).persist()
    learnedPq.count()
    val learnedCoarse = Similarity.kmeansTrain(e, seed, maxIters = 2)

    def meanRecall(approx: DataFrame, exact: DataFrame): Double =
      Similarity.recallAtK(approx, exact, k = 10)
        .agg(avg(col("recall"))).head().getDouble(0)

    val configs: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("seeded", seed, seedPq),
      ("learned-pq", seed, learnedPq),
      ("full-learned", learnedCoarse, learnedPq))

    for ((name, ivfCb, pqCb) <- configs) {
      val index = Similarity.ivfPqIndex(e, ivfCb, pqCb, m = 4, dim = 64)
        .persist()
      index.count()
      for (np <- nprobes; (qn, queries, exact) <- querySets) {
        val adc = meanRecall(Similarity.ivfPqTopKIndexed(index, ivfCb, pqCb,
          queries, m = 4, dim = 64, nprobe = np, k = 10), exact)
        val rr = meanRecall(Similarity.ivfPqTopKIndexedReranked(index, ivfCb,
          pqCb, queries, e, m = 4, dim = 64, nprobe = np, shortlist = 50,
          k = 10), exact)
        println(f"LADDER $name%-13s $qn%-9s nprobe=$np%-2d adc=$adc%.4f rerank50=$rr%.4f")
      }
      index.unpersist()
    }
    seedPq.unpersist(); learnedPq.unpersist()
    spark.stop()
  }
}
