package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB failure mode the hot-bucket guard exists for: a flood of
  * identical (or sketch-identical) documents lands every member in the
  * same band bucket, and the bucket self-join goes quadratic in the flood
  * size. These tests plant a degenerate fixture (a 300-document flood
  * next to a handful of distinct docs) and assert that (a) uncapped, the
  * pair count really is quadratic; (b) the cap bounds the candidate set;
  * (c) the production composition — exact collapse first
  * ([[Dedup.nearDupKeepFirst]]) — dedups the flood correctly WITHOUT
  * relying on the cap, because collapse leaves one bucket member per
  * distinct content.
  */
class DegenerateBucketSpec extends SparkSpec {
  import spark.implicits._

  private val FloodSize = 300
  private val FloodText = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu"

  // ids 1..300 share identical text; 1001..1005 are distinct documents
  private def degenerate = {
    val flood = (1 to FloodSize).map(i => (i.toLong, FloodText))
    val distinct = Seq(
      (1001L, "one unique document about brewing equipment maintenance"),
      (1002L, "another unique document on regional water chemistry data"),
      (1003L, "completely unrelated text mentioning fermentation vessels"),
      (1004L, "fourth text with entirely different token distribution"),
      (1005L, "fifth standalone document concerning barrel aging times"))
    (flood ++ distinct).toDF("doc_id", "text")
  }

  test("uncapped LSH flood really is quadratic (the hazard exists)") {
    val n = Dedup.lshCandidatePairs(degenerate, "doc_id",
      numHashes = 16, bands = 4).count()
    // every flood pair collides in every band
    assert(n >= FloodSize.toLong * (FloodSize - 1) / 2)
  }

  test("bucket cap bounds the candidate set and keeps non-flood pairs") {
    val capped = Dedup.lshCandidatePairs(degenerate, "doc_id",
      numHashes = 16, bands = 4, maxBucketSize = 8)
    // flood buckets (300 members > 8) dropped; at most the distinct docs
    // could still pair up: candidate count bounded by pairs over 5 docs
    assert(capped.count() <= 10)
    spark.catalog.clearCache()
  }

  test("simhash bucket cap bounds sketch-identical floods") {
    val sketches = Dedup.simhash(degenerate, "doc_id", "text")
    val uncapped = Dedup.simhashPairs(sketches, maxHamming = 3).count()
    assert(uncapped >= FloodSize.toLong * (FloodSize - 1) / 2)
    val capped = Dedup.simhashPairs(sketches, maxHamming = 3,
      maxBucketSize = 8).count()
    assert(capped <= 10)
    spark.catalog.clearCache()
  }

  test("embedding bucket cap bounds a degenerate cell") {
    // 200 vectors in one bucket, 4 in another
    val vecs = ((1 to 200).map(i => (i.toLong, 0, Array(1.0f, 0.0f))) ++
      (201 to 204).map(i => (i.toLong, 1, Array(0.0f, 1.0f))))
      .toDF("vec_id", "label", "embedding")
    val uncapped = Similarity.blockedNearDupPairs(vecs, "label", 0.9).count()
    assert(uncapped >= 199L * 200 / 2)
    val capped = Similarity.blockedNearDupPairs(vecs, "label", 0.9,
      maxBucketSize = 16).count()
    assert(capped == 6) // only the 4-member bucket survives: C(4,2)
    spark.catalog.clearCache()
  }

  test("semantic cell cap bounds a collapsed k-means cell") {
    // 200 identical embeddings collapse into ONE learned cell no matter
    // how the codebook trains (an embedding flood / degenerate quantizer
    // — SemDeDup's version of the LSH flood); 4 identical orthogonal
    // vectors form a small healthy cell
    val vecs = ((1 to 200).map(i => (i.toLong, Array(1.0f, 0.0f))) ++
      (201 to 204).map(i => (i.toLong, Array(0.0f, 1.0f))))
      .toDF("vec_id", "embedding")
    val seed = vecs.filter(col("vec_id").isin(1L, 201L))
    val uncapped = Similarity.semanticDedupPairs(vecs, seed,
      maxIters = 2, threshold = 0.9).count()
    assert(uncapped >= 199L * 200 / 2) // the hazard exists: quadratic cell
    val capped = Similarity.semanticDedupPairs(vecs, seed,
      maxIters = 2, threshold = 0.9, maxBucketSize = 16).count()
    assert(capped == 6) // flood cell dropped loudly; C(4,2) survives
    spark.catalog.clearCache()
  }

  test("paired cap judges COMBINED membership in the incremental shape") {
    // flood split across corpus and batch: each side alone is under a
    // generous cap of 200, together they exceed it — a per-side cap
    // would miss this bucket entirely
    val corpus = degenerate.filter(col("doc_id") <= 150 || col("doc_id") > 1000)
    val batch = degenerate.filter(col("doc_id") > 150 && col("doc_id") <= 300)
    val uncapped = Dedup.incrementalLshCandidates(corpus, batch, "doc_id",
      numHashes = 16, bands = 4).count()
    assert(uncapped >= 150L * 150) // every cross flood pair collides
    val capped = Dedup.incrementalLshCandidates(corpus, batch, "doc_id",
      numHashes = 16, bands = 4, maxBucketSize = 200).count()
    assert(capped <= 10)
    spark.catalog.clearCache()
  }

  test("nearDupKeepFirst collapses the flood before sketching") {
    val kept = Dedup.nearDupKeepFirst(degenerate, "doc_id",
      numHashes = 16, bands = 4, threshold = 0.5, maxBucketSize = 8)
      .select("doc_id").as[Long].collect().sorted
    // the flood survives as exactly its keeper (id 1) + the 5 distinct
    assert(kept.toSeq == Seq(1L, 1001L, 1002L, 1003L, 1004L, 1005L))
    spark.catalog.clearCache()
  }
}
