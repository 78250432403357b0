package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for the streaming EXACT containment join:
  * after any sequence of micro-batches, the accumulated pair set (ids +
  * jaccard + both containments + quote_like) must equal the batch
  * containmentSelfPairs over everything ingested — and replays must not
  * move it. Direction coverage: an old document contained in a LATER
  * one, a later document contained in an EARLIER one, and a same-batch
  * containment.
  */
class ContainmentIngestSpec extends SparkSpec {
  import spark.implicits._

  private type PairRow = (Long, Long, Double, Double, Double, Int)
  private def rows(df: org.apache.spark.sql.DataFrame): Set[PairRow] =
    df.select("doc_a", "doc_b", "jaccard", "cont_a_in_b", "cont_b_in_a",
        "quote_like")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).toSet

  test("accumulated pairs equal the batch join; replay is idempotent") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ci_").toString
    val (indexDir, pairsDir) = (s"$tmp/index", s"$tmp/pairs")
    val batches = Seq(
      Seq((1L, "a b c d e f g h"), (2L, "x y z q")),
      Seq((11L, "c d e"),                  // contained in earlier 1
        (12L, "x y z q r s t u v w"),      // CONTAINS earlier 2
        (13L, "m n o p"), (14L, "n o p")), // same-batch containment
      Seq((21L, "c d e q r s t u")))       // contains 11 across batches

    val input = MemoryStream[(Long, String)]
    val q = ContainmentIngest.start(input.toDF().toDF("doc_id", "text"),
      indexDir, pairsDir, s"$tmp/ckpt", "doc_id", "text",
      threshold = 0.5, k = 1)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val all = batches.flatten.toDF("doc_id", "text")
    val want = rows(Dedup.containmentSelfPairs(all, "doc_id", 0.5, k = 1))
    def got() = rows(ContainmentIngest.pairs(spark, pairsDir))
    assert(want.exists(p => p._1 == 1L && p._2 == 11L), "new-in-old")
    assert(want.exists(p => p._1 == 2L && p._2 == 12L), "old-in-new")
    assert(want.exists(p => p._1 == 13L && p._2 == 14L), "same-batch")
    assert(want.exists(p => p._1 == 11L && p._2 == 21L), "cross-batch container")
    assert(got() == want,
      s"missing ${want -- got()}, extra ${got() -- want}")
    // at-least-once replay of the middle batch: pair set must not move
    ContainmentIngest.ingestBatch(batches(1).toDF("doc_id", "text"),
      indexDir, pairsDir, "doc_id", "text", threshold = 0.5, k = 1)
    assert(got() == want, "replayed batch moved the pair set")
    // compact: replay-dedup fixpoint of index + pairs, invisible to reads
    val rawIdx = spark.read.parquet(indexDir).count()
    ContainmentIngest.compact(spark, indexDir, pairsDir, "doc_id")
    assert(spark.read.parquet(indexDir).count() < rawIdx,
      "replayed index rows should collapse")
    assert(got() == want, "compact moved the pair set")
  }
}
