package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for the streaming weighted containment join:
  * after any sequence of micro-batches the accumulated pair set must
  * equal the batch weighted containment join over everything ingested;
  * replays must not move it; purge forgets a document everywhere.
  */
class WeightedContainmentIngestSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(idBase: Long, texts: Seq[String]): Seq[(Long, String)] =
    texts.zipWithIndex.map { case (t, i) => (idBase + i, t) }

  test("accumulated pairs equal the batch weighted containment; replay idempotent; purge forgets") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_wcn_").toString
    val (indexDir, pairsDir) = (s"$tmp/index", s"$tmp/pairs")
    // coverage is the signature: "spam spam spam" inside a long page is
    // weighted-contained only if the page carries the repetition too
    val batches = Seq(
      corpus(0, Seq("spam spam spam",
        "spam spam spam filler words beyond count",
        "spam other stuff entirely different")),
      corpus(100, Seq("spam spam spam extra",     // contains 0 by weight
        "alpha beta alpha", "unrelated text")),
      corpus(200, Seq("alpha beta alpha beta gamma delta epsilon")))

    val input = MemoryStream[(Long, String)]
    val q = WeightedContainmentIngest.start(
      input.toDF().toDF("doc_id", "text"),
      indexDir, pairsDir, s"$tmp/ckpt", "doc_id", "text",
      threshold = 0.6, k = 1)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val all = batches.flatten.toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
    val want = Dedup.weightedContainmentPairs(all, "doc_id", 0.6, k = 1)
      .collect().map(key).toSet
    def got() = WeightedContainmentIngest.pairs(spark, pairsDir)
      .collect().map(key).toSet
    assert(want.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(want.exists(p => p._1 < 100 && p._2 >= 100),
      "fixture has no cross-batch pair")
    assert(got() == want,
      s"missing ${want -- got()}, extra ${got() -- want}")
    // at-least-once replay: pair set must not move
    WeightedContainmentIngest.ingestBatch(batches(0).toDF("doc_id", "text"),
      indexDir, pairsDir, "doc_id", "text", threshold = 0.6, k = 1)
    assert(got() == want, "replayed batch moved the pair set")
    // compact: replay-dedup fixpoint of index + pairs, invisible to reads
    val rawIdx = spark.read.parquet(indexDir).count()
    WeightedContainmentIngest.compact(spark, indexDir, pairsDir)
    assert(spark.read.parquet(indexDir).count() < rawIdx,
      "replayed index rows should collapse")
    assert(got() == want, "compact moved the pair set")
    // purge doc 0: pairs and store row forgotten, survivors intact
    val removed = WeightedContainmentIngest.purge(spark,
      Seq(0L).toDF("doc_id"), indexDir, pairsDir)
    assert(removed.values.sum > 0, s"purge removed nothing: $removed")
    val after = got()
    assert(!after.exists(p => p._1 == 0L || p._2 == 0L))
    assert(after == want.filterNot(p => p._1 == 0L || p._2 == 0L))
  }
}
