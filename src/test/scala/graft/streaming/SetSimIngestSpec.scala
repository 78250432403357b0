package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for the streaming exact set-similarity join:
  * after any sequence of micro-batches, the accumulated pair set must
  * equal the batch prefix-filtered join over everything ingested — and
  * replays must not move it.
  */
class SetSimIngestSpec extends SparkSpec {
  import spark.implicits._

  // small word universes with planted overlaps WITHIN and ACROSS batches
  private def corpus(idBase: Long, words: Seq[String]): Seq[(Long, String)] =
    words.zipWithIndex.map { case (w, i) => (idBase + i, w) }

  test("accumulated pairs equal the batch join; replay is idempotent") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ss_").toString
    val (indexDir, pairsDir) = (s"$tmp/index", s"$tmp/pairs")
    val batches = Seq(
      corpus(0, Seq("alpha beta gamma delta", "alpha beta gamma epsilon",
        "iota kappa lambda")),
      corpus(100, Seq("alpha beta gamma delta", // cross-batch dup of 0
        "iota kappa lambda mu nu xi", "rho sigma tau")),
      corpus(200, Seq("rho sigma tau upsilon", // 0.75 vs 102
        "alpha beta gamma zeta")))              // 0.6 vs 0/1

    val input = MemoryStream[(Long, String)]
    val q = SetSimIngest.start(input.toDF().toDF("doc_id", "text"),
      indexDir, pairsDir, s"$tmp/ckpt", "doc_id", "text",
      threshold = 0.5, k = 1)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val all = batches.flatten.toDF("doc_id", "text")
    val want = Dedup.setSimilarityPairs(all, "doc_id", 0.5, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def got() = SetSimIngest.pairs(spark, pairsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "fixture produced no pairs — test is vacuous")
    // cross-batch pairs must exist, or the index join went untested
    assert(want.exists(p => p._1 < 100 && p._2 >= 100),
      "fixture has no cross-batch pair")
    assert(got() == want,
      s"missing ${want -- got()}, extra ${got() -- want}")
    // at-least-once replay of the middle batch: pair set must not move
    SetSimIngest.ingestBatch(batches(1).toDF("doc_id", "text"),
      indexDir, pairsDir, "doc_id", "text", threshold = 0.5, k = 1)
    assert(got() == want, "replayed batch moved the pair set")
    // compact: replay-dedup fixpoint of index + pairs, invisible to
    // reads; further ingest converges identically afterwards
    val rawBefore = spark.read.parquet(indexDir).count()
    SetSimIngest.compact(spark, indexDir, pairsDir, "doc_id")
    assert(spark.read.parquet(indexDir).count() < rawBefore,
      "replayed index rows should collapse")
    assert(got() == want, "compact moved the pair set")
    SetSimIngest.ingestBatch(batches(1).toDF("doc_id", "text"),
      indexDir, pairsDir, "doc_id", "text", threshold = 0.5, k = 1)
    assert(got() == want, "post-compact replay moved the pair set")
  }
}
