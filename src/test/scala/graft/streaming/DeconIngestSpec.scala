package graft.streaming

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for streaming decontamination: feeding the
  * corpus through [[DeconIngest]] in several micro-batches must release
  * exactly the rows the batch operator keeps and flag exactly the docs
  * the batch report flags, with identical overlap counts.
  */
class DeconIngestSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched decontamination equals the batch operator") {
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
    val benchmark = docs.filter(col("source") === "src9")
      .select("doc_id", "text")
    // corpus = the non-benchmark slice, plus one PLANTED contaminated doc
    // (a verbatim benchmark text under a fresh id) so the flagged side is
    // provably non-empty at this scale factor
    val planted = benchmark.limit(1)
      .select(lit(999999L).as("doc_id"), col("text"))
    val corpus = docs.filter(col("source") =!= "src9")
      .select("doc_id", "text").unionByName(planted)
      .as[(Long, String)].collect().toSeq

    val tmp = java.nio.file.Files.createTempDirectory("graft_di_").toString
    val (idxDir, cleanDir, flagDir, ckpt) =
      (s"$tmp/idx", s"$tmp/clean", s"$tmp/flag", s"$tmp/ckpt")
    DeconIngest.writeBenchIndex(benchmark, idxDir)

    val input = MemoryStream[(Long, String)]
    val q = DeconIngest.start(input.toDF().toDF("doc_id", "text"),
      idxDir, cleanDir, flagDir, ckpt)
    try {
      corpus.grouped(math.max(corpus.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val corpusDf = corpus.toDF("doc_id", "text")
    val streamedClean = spark.read.parquet(cleanDir).distinct()
      .collect().map(_.toSeq).toSet
    val batchClean = TextAnalysis.decontaminate(
        corpusDf, benchmark, "doc_id", "text", 8)
      .collect().map(_.toSeq).toSet
    assert(streamedClean == batchClean)

    val streamedFlags = spark.read.parquet(flagDir).distinct()
      .collect().map(_.toSeq).toSet
    val batchFlags = TextAnalysis.contaminationReport(
        corpusDf, benchmark, "doc_id", "text", 8)
      .collect().map(_.toSeq).toSet
    assert(streamedFlags == batchFlags)
    // the planted copy is flagged, never released
    assert(streamedFlags.exists(_.head == 999999L))
    assert(!streamedClean.exists(_.head == 999999L))
    spark.catalog.clearCache()
  }

  test("starting without a benchmark index fails fast with a clear message") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val tmp = java.nio.file.Files.createTempDirectory("graft_di_e_").toString
    val e = intercept[IllegalArgumentException] {
      DeconIngest.start(input.toDF().toDF("doc_id", "text"),
        s"$tmp/missing_idx", s"$tmp/clean", s"$tmp/flag", s"$tmp/ckpt")
    }
    assert(e.getMessage.contains("writeBenchIndex"))
  }

  test("re-registering a benchmark and compacting the index changes nothing") {
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
    val benchmark = docs.filter(col("source") === "src9")
      .select("doc_id", "text")
    val corpus = docs.filter(col("source") =!= "src9")
      .select("doc_id", "text")

    val tmp = java.nio.file.Files.createTempDirectory("graft_di_c_").toString
    val idxDir = s"$tmp/idx"
    DeconIngest.writeBenchIndex(benchmark, idxDir)
    DeconIngest.writeBenchIndex(benchmark, idxDir) // duplicate registration
    val before = TextAnalysis.contaminationReportIndexed(corpus,
        spark.read.parquet(idxDir), "doc_id", "text", 8)
      .collect().map(_.toSeq).toSet
    // duplicate grams in the append-grown index must not double counts
    val direct = TextAnalysis.contaminationReport(corpus, benchmark,
        "doc_id", "text", 8)
      .collect().map(_.toSeq).toSet
    assert(before == direct)

    DeconIngest.compactBenchIndex(spark, idxDir, 1)
    val after = TextAnalysis.contaminationReportIndexed(corpus,
        spark.read.parquet(idxDir), "doc_id", "text", 8)
      .collect().map(_.toSeq).toSet
    assert(after == before)
    spark.catalog.clearCache()
  }

  test("embedding face: streamed batches equal the batch operator; duplicate registration harmless") {
    implicit val ctx = spark.sqlContext
    val e = graft.Tables.embeddings(spark, sf0001)
    val bench = e.filter(col("vec_id") % 20 === 9)
    val corpus = e.filter(col("vec_id") % 20 =!= 9)
      .select("vec_id", "embedding")

    val tmp = java.nio.file.Files.createTempDirectory("graft_di_e_").toString
    val (idxDir, cleanDir, flaggedDir, ckpt) =
      (s"$tmp/idx", s"$tmp/clean", s"$tmp/flag", s"$tmp/ckpt")
    DeconIngest.writeBenchEmbIndex(bench, idxDir)
    DeconIngest.writeBenchEmbIndex(bench, idxDir) // duplicate registration

    // feed the corpus through in two micro-batches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Seq[Float])]
    val q = DeconIngest.startEmbedding(
      input.toDF().toDF("vec_id", "embedding"),
      idxDir, cleanDir, flaggedDir, ckpt, threshold = 0.35)
    val rows = corpus.as[(Long, Seq[Float])].collect()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a.toSeq: _*); q.processAllAvailable()
      input.addData(b.toSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val streamedClean = spark.read.parquet(cleanDir)
      .select("vec_id").as[Long].collect().toSet
    val batchClean = graft.ops.Similarity.decontaminateByEmbedding(
        corpus, bench, threshold = 0.35)
      .select("vec_id").as[Long].collect().toSet
    assert(streamedClean == batchClean)
    // audit rows equal the batch report (duplicate index rows collapsed)
    val streamedFlagged = spark.read.parquet(flaggedDir)
      .collect().map(_.toSeq).toSet
    val batchFlagged = graft.ops.Similarity.embeddingContaminationReport(
        corpus, bench, threshold = 0.35)
      .collect().map(_.toSeq).toSet
    assert(streamedFlagged == batchFlagged)

    DeconIngest.compactBenchEmbIndex(spark, idxDir, 1)
    assert(spark.read.parquet(idxDir).count() == bench.count())
    spark.catalog.clearCache()
  }
}
