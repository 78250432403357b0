package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for the streaming weighted set-similarity
  * join: after any sequence of micro-batches the accumulated pair set
  * must equal the batch weighted prefix-filtered join over everything
  * ingested; replays must not move it; purge forgets a document
  * everywhere.
  */
class WeightedSetSimIngestSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(idBase: Long, texts: Seq[String]): Seq[(Long, String)] =
    texts.zipWithIndex.map { case (t, i) => (idBase + i, t) }

  test("accumulated pairs equal the batch weighted join; replay idempotent; purge forgets") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_wss_").toString
    val (indexDir, pairsDir) = (s"$tmp/index", s"$tmp/pairs")
    // REPETITION is the signature: same word SETS, different multisets
    // — a set-jaccard ingest would call several of these identical
    val batches = Seq(
      corpus(0, Seq("spam spam spam ham", "spam ham",
        "alpha beta alpha beta")),
      corpus(100, Seq("spam spam spam ham eggs", // heavy vs 0
        "alpha beta alpha beta gamma", "solo words here")),
      corpus(200, Seq("spam spam ham", "alpha beta alpha")))

    val input = MemoryStream[(Long, String)]
    val q = WeightedSetSimIngest.start(input.toDF().toDF("doc_id", "text"),
      indexDir, pairsDir, s"$tmp/ckpt", "doc_id", "text",
      threshold = 0.5, k = 1)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val all = batches.flatten.toDF("doc_id", "text")
    val want = Dedup.weightedSetSimilarityPairs(all, "doc_id", 0.5, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def got() = WeightedSetSimIngest.pairs(spark, pairsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(want.exists(p => p._1 < 100 && p._2 >= 100),
      "fixture has no cross-batch pair")
    // weighted must disagree with set semantics somewhere, or the
    // fixture doesn't exercise the multiset machinery
    val setPairs = Dedup.setSimilarityPairs(all, "doc_id", 0.5, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.map(p => (p._1, p._2)) != setPairs,
      "weighted and set joins agree — fixture has no repetition signal")
    assert(got() == want,
      s"missing ${want -- got()}, extra ${got() -- want}")
    // at-least-once replay of the middle batch: pair set must not move
    WeightedSetSimIngest.ingestBatch(batches(1).toDF("doc_id", "text"),
      indexDir, pairsDir, "doc_id", "text", threshold = 0.5, k = 1)
    assert(got() == want, "replayed batch moved the pair set")
    // compact: replay-dedup fixpoint of index + pairs, invisible to reads
    val rawIdx = spark.read.parquet(indexDir).count()
    WeightedSetSimIngest.compact(spark, indexDir, pairsDir)
    assert(spark.read.parquet(indexDir).count() < rawIdx,
      "replayed index rows should collapse")
    assert(got() == want, "compact moved the pair set")
    // right-to-be-forgotten: purge doc 0 — its pairs and store row go;
    // survivors keep theirs
    val removed = WeightedSetSimIngest.purge(spark,
      Seq(0L).toDF("doc_id"), indexDir, pairsDir)
    assert(removed.values.sum > 0, s"purge removed nothing: $removed")
    val after = got()
    assert(!after.exists(p => p._1 == 0L || p._2 == 0L),
      "purged doc still appears in pairs")
    assert(after == want.filterNot(p => p._1 == 0L || p._2 == 0L))
    assert(spark.read.parquet(indexDir)
      .filter($"doc_id" === 0L).count() == 0)
  }
}
