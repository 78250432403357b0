package graft.streaming

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for streaming line dedup: after the corpus has
  * streamed through in micro-batches, (a) the republish pass over the
  * raw corpus must EXACTLY equal the batch operator, (b) the cumulative
  * index must equal the batch frequency relation, and (c) prefix
  * semantics hold mid-stream — a footer that crosses the threshold is
  * stripped from every later batch.
  */
class LineDedupIngestSpec extends SparkSpec {
  import spark.implicits._

  // 30 docs, each with a unique body line plus one of 2 shared footers;
  // footer f0 appears in 15 docs, f1 in 15 — both cross minDocs=10
  private def corpus: Seq[(Long, String)] =
    (0L until 30L).map { i =>
      (i, s"unique body line $i\nshared footer f${i % 2}")
    }

  test("republish over the streamed index equals the batch operator") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ld_").toString
    val (idxDir, cleanDir, ckpt) = (s"$tmp/idx", s"$tmp/clean", s"$tmp/ckpt")
    val input = MemoryStream[(Long, String)]
    val q = LineDedupIngest.start(input.toDF().toDF("doc_id", "text"),
      idxDir, cleanDir, ckpt, minDocs = 10)
    try {
      corpus.grouped(10).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val corpusDf = corpus.toDF("doc_id", "text")
    val republished = LineDedupIngest.republish(corpusDf, idxDir, minDocs = 10)
      .collect().map(_.toSeq).toSet
    val batch = TextAnalysis.lineDedup(corpusDf, "doc_id", "text", minDocs = 10)
      .collect().map(_.toSeq).toSet
    assert(republished == batch)
    // the footers really were frequent: every republished doc lost one
    assert(republished.forall(!_.apply(1).toString.contains("shared footer")))

    // (b) cumulative index partials re-aggregate to the batch frequencies
    val idx = spark.read.parquet(idxDir)
      .groupBy("line").agg(sum("n_docs").as("n_docs"))
      .as[(String, Long)].collect().toMap
    val batchCounts = TextAnalysis.lineDocCounts(corpusDf, "text")
      .as[(String, Long)].collect().toMap
    assert(idx == batchCounts)

    // compaction preserves the aggregate exactly
    LineDedupIngest.compactLineIndex(spark, idxDir, numFiles = 1)
    val compacted = spark.read.parquet(idxDir)
      .as[(String, Long)].collect().toMap
    assert(compacted == batchCounts)
  }

  test("prefix semantics: a footer past the threshold is stripped from later batches") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ld2_").toString
    val (idxDir, cleanDir, ckpt) = (s"$tmp/idx", s"$tmp/clean", s"$tmp/ckpt")
    // batch 1: 12 docs with footer fX (crosses minDocs=10 immediately);
    // batch 2: 3 more fX docs — fX must be stripped from them
    val b1 = (0L until 12L).map(i => (i, s"body $i\nfooter fX"))
    val b2 = (100L until 103L).map(i => (i, s"body $i\nfooter fX"))
    val input = MemoryStream[(Long, String)]
    val q = LineDedupIngest.start(input.toDF().toDF("doc_id", "text"),
      idxDir, cleanDir, ckpt, minDocs = 10)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val cleaned = spark.read.parquet(cleanDir)
      .as[(Long, String)].collect().toMap
    // batch-2 docs arrived after fX crossed the threshold: footer gone
    (100L until 103L).foreach { i =>
      assert(cleaned(i) == s"body $i", s"doc $i kept its footer")
    }
    // batch-1 docs were cleaned against an index that already included
    // their own batch's counts, so fX (12 >= 10) is stripped there too
    assert(cleaned(0L) == "body 0")
  }
}
