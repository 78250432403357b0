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
    val idx = LineDedupIngest.readLineIndex(spark, idxDir)
      .as[(String, Long)].collect().toMap
    val batchCounts = TextAnalysis.lineDocCounts(corpusDf, "text")
      .as[(String, Long)].collect().toMap
    assert(idx == batchCounts)

    // compaction preserves the aggregate exactly
    LineDedupIngest.compactLineIndex(spark, idxDir, numFiles = 1)
    val compacted = LineDedupIngest.readLineIndex(spark, idxDir)
      .as[(String, Long)].collect().toMap
    assert(compacted == batchCounts)
  }

  test("at-least-once replay: a retried epoch does not inflate line counts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ld3_").toString
    val (idxDir, cleanDir) = (s"$tmp/idx", s"$tmp/clean")
    // 12 docs sharing footer fR, split in two epochs of 6 — fR sits at
    // exactly minDocs=12 only if BOTH epochs count once each
    val all = (0L until 12L).map(i => (i, s"body $i\nfooter fR"))
    val (e0, e1) = all.splitAt(6)
    LineDedupIngest.ingestBatch(e0.toDF("doc_id", "text"), idxDir, cleanDir,
      minDocs = 12, "doc_id", "text", epochId = 0L)
    // epoch 1 delivered TWICE — the foreachBatch retry
    LineDedupIngest.ingestBatch(e1.toDF("doc_id", "text"), idxDir, cleanDir,
      minDocs = 12, "doc_id", "text", epochId = 1L)
    LineDedupIngest.ingestBatch(e1.toDF("doc_id", "text"), idxDir, cleanDir,
      minDocs = 12, "doc_id", "text", epochId = 1L)
    // the replayed partials collapse: fR counts 12, not 18
    val counts = LineDedupIngest.readLineIndex(spark, idxDir)
      .as[(String, Long)].collect().toMap
    assert(counts("footer fR") == 12L)
    // republish over the raw archive equals the batch operator (the
    // inflated-index over-strip the r13 advice described cannot happen:
    // a 6+6 corpus with minDocs=13 would keep the footer, and does)
    val corpusDf = all.toDF("doc_id", "text")
    val republished = LineDedupIngest.republish(corpusDf, idxDir, minDocs = 13)
      .collect().map(_.toSeq).toSet
    val batch = TextAnalysis.lineDedup(corpusDf, "doc_id", "text", minDocs = 13)
      .collect().map(_.toSeq).toSet
    assert(republished == batch)
    assert(republished.forall(_.apply(1).toString.contains("footer fR")))
    // compaction after the replay still lands on the deduplicated counts
    LineDedupIngest.compactLineIndex(spark, idxDir, numFiles = 1)
    val compacted = LineDedupIngest.readLineIndex(spark, idxDir)
      .as[(String, Long)].collect().toMap
    assert(compacted("footer fR") == 12L)
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
