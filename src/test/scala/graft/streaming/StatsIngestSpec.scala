package graft.streaming

import graft.SparkSpec
import graft.ops.Corpus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for the running data card, and idempotency of
  * the epoch-keyed partials under at-least-once replay.
  */
class StatsIngestSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[(Long, String, String, String)] =
    (0L until 24L).map { i =>
      (i, s"src${i % 3}", if (i % 4 == 0) "de" else "en",
        (0 to (i % 5).toInt).map(j => s"w$j").mkString(" "))
    }

  test("streamed running card equals the batch card's mergeable columns") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_st_").toString
    val input = MemoryStream[(Long, String, String, String)]
    val q = StatsIngest.start(
      input.toDF().toDF("doc_id", "source", "lang", "text"),
      s"$tmp/stats", s"$tmp/ckpt")
    try {
      corpus.grouped(7).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = StatsIngest.report(spark, s"$tmp/stats")
      .select("source", "lang", "n_docs", "total_chars", "total_tokens",
        "min_chars", "max_chars", "avg_tokens")
      .collect().map(_.toSeq).toSet
    val batch = Corpus.dataCard(
        corpus.toDF("doc_id", "source", "lang", "text"), "source", "lang")
      .select("source", "lang", "n_docs", "total_chars", "total_tokens",
        "min_chars", "max_chars", "avg_tokens")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("replayed epoch partials do not double-count (at-least-once safety)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_st2_").toString
    val statsDir = s"$tmp/stats"
    val b1 = corpus.take(10).toDF("doc_id", "source", "lang", "text")
    val b2 = corpus.drop(10).toDF("doc_id", "source", "lang", "text")
    StatsIngest.ingestBatch(b1, statsDir, 0L, "source", "lang", "text")
    StatsIngest.ingestBatch(b2, statsDir, 1L, "source", "lang", "text")
    val before = StatsIngest.report(spark, statsDir)
      .collect().map(_.toSeq).toSet
    // the engine re-delivers epoch 1 after a crash: identical partials
    // re-append; the report must not change
    StatsIngest.ingestBatch(b2, statsDir, 1L, "source", "lang", "text")
    val after = StatsIngest.report(spark, statsDir)
      .collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("keyed card: streamed distinct counts match the batch card bit-for-bit, replay-safe") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_st3_").toString
    val (statsDir, keysDir) = (s"$tmp/stats", s"$tmp/keys")
    val input = MemoryStream[(Long, String, String, String)]
    val q = StatsIngest.start(
      input.toDF().toDF("doc_id", "source", "lang", "text"),
      statsDir, s"$tmp/ckpt", keysDir = Some(keysDir))
    try {
      corpus.grouped(7).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batch = Corpus.dataCard(
        corpus.toDF("doc_id", "source", "lang", "text"), "source", "lang")
      .collect().map(_.toSeq).toSet
    def streamed() =
      StatsIngest.report(spark, statsDir, keysDir = Some(keysDir))
        .collect().map(_.toSeq).toSet
    // full column set — n_distinct_texts, dup_rate and token_share
    // included — equals the batch card exactly
    assert(streamed() == batch)
    // at-least-once replay of an epoch: the re-appended key set is
    // absorbed by the distinct; the card must not move
    val replay = corpus.slice(7, 14).toDF("doc_id", "source", "lang", "text")
    StatsIngest.ingestBatch(replay, statsDir, 1L, "source", "lang", "text",
      keysDir = Some(keysDir))
    assert(streamed() == batch, "replayed epoch moved the card")
    // compaction collapses the duplicate keys and changes nothing
    val rowsBefore = spark.read.parquet(keysDir).count()
    StatsIngest.compactKeys(spark, keysDir)
    val rowsAfter = spark.read.parquet(keysDir).count()
    assert(rowsAfter < rowsBefore, "compaction must shrink the key set")
    assert(streamed() == batch, "compaction moved the card")
  }
}
