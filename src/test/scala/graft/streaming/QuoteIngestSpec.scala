package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Stream-vs-batch parity for the streaming quote/containment family:
  * after any sequence of micro-batches, the accumulated pair set (ids,
  * jaccard, both containments, quote_like flag) must equal the batch
  * anchor-blocking + containment composition over everything ingested;
  * replays must not move it; purge must forget a document completely.
  */
class QuoteIngestSpec extends SparkSpec {
  import spark.implicits._

  private def words(a: Int, b: Int): String =
    (a until b).map(i => s"w$i").mkString(" ")

  private type PairRow = (Long, Long, Double, Double, Double, Int)
  private def rows(df: org.apache.spark.sql.DataFrame): Set[PairRow] =
    df.select("doc_a", "doc_b", "jaccard", "cont_a_in_b", "cont_b_in_a",
        "quote_like")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).toSet

  test("accumulated pairs equal the batch composition; replay + purge") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_qi_").toString
    val (anchorDir, docsDir, pairsDir) =
      (s"$tmp/anchors", s"$tmp/docs", s"$tmp/pairs")
    // long docs + embedded windows: quote 3 of long 1 arrives a batch
    // LATER (the cross-batch index probe), quote 5 of long 4 in the
    // SAME batch (the batch-internal leg), quote 6 of long 2 last
    val batches = Seq(
      Seq((1L, words(0, 40)), (2L, words(100, 140))),
      Seq((3L, words(10, 25)), (4L, words(200, 240)),
        (5L, words(210, 225))),
      Seq((6L, words(110, 125))))

    val input = MemoryStream[(Long, String)]
    val q = QuoteIngest.start(input.toDF().toDF("doc_id", "text"),
      anchorDir, docsDir, pairsDir, s"$tmp/ckpt", "doc_id", "text",
      nAnchors = 8, threshold = 0.5)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val all = batches.flatten.toDF("doc_id", "text")
    val want = rows(Dedup.containmentPairs(all,
      Dedup.anchorCandidatePairs(all, "doc_id", 8), "doc_id", 3, 0.5))
    def got() = rows(QuoteIngest.pairs(spark, pairsDir))
    // non-vacuous: both the cross-batch and the batch-internal quote
    // pairs must be in the ground truth (quote fully contained)
    assert(want.exists(p => p._1 == 1L && p._2 == 3L && p._5 == 1.0),
      s"fixture lost the cross-batch quote pair: $want")
    assert(want.exists(p => p._1 == 4L && p._2 == 5L && p._5 == 1.0),
      s"fixture lost the batch-internal quote pair: $want")
    assert(got() == want,
      s"missing ${want -- got()}, extra ${got() -- want}")
    // at-least-once replay of the middle batch: pair set must not move
    QuoteIngest.ingestBatch(batches(1).toDF("doc_id", "text"),
      anchorDir, docsDir, pairsDir, "doc_id", "text",
      nAnchors = 8, threshold = 0.5)
    assert(got() == want, "replayed batch moved the pair set")
    // compact: replay-dedup fixpoint of all three stores
    val rawDocs = spark.read.parquet(docsDir).count()
    QuoteIngest.compact(spark, pairsDir, anchorDir, docsDir)
    assert(spark.read.parquet(docsDir).count() < rawDocs,
      "replayed doc rows should collapse")
    assert(got() == want, "compact moved the pair set")

    // purge long 1: no store may reference it afterwards
    val removed = QuoteIngest.purge(spark, Seq(1L).toDF("id"),
      anchorDir, docsDir, pairsDir)
    assert(removed(anchorDir) >= 8L) // its anchor rows (replayed twice)
    assert(removed(docsDir) >= 1L)
    assert(spark.read.parquet(anchorDir)
      .filter(col("doc_id") === 1L).count() == 0)
    assert(spark.read.parquet(docsDir)
      .filter(col("doc_id") === 1L).count() == 0)
    assert(spark.read.parquet(pairsDir)
      .filter(col("doc_a") === 1L || col("doc_b") === 1L).count() == 0)
    // a re-ingested copy of the purged text is brand new: it re-pairs
    // with the still-indexed quote 3 through the index probe
    QuoteIngest.ingestBatch(Seq((9L, words(0, 40))).toDF("doc_id", "text"),
      anchorDir, docsDir, pairsDir, "doc_id", "text",
      nAnchors = 8, threshold = 0.5)
    assert(got().exists(p => p._1 == 3L && p._2 == 9L && p._4 == 1.0),
      s"re-ingested copy must pair with the surviving quote: ${got()}")
  }
}
