package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-vs-batch parity for epoch-aware mixture ingestion: the copy
  * count of a document is a pure (group pct, md5(id)) function, so
  * micro-batched mixing against the stored rate table must equal the
  * batch operator on the whole corpus — including the epoch indices.
  */
class MixIngestSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched epoch mixing equals the batch sampler") {
    implicit val ctx = spark.sqlContext
    val docsDf = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "n_chars")
    val docs = docsDf.as[(Long, String, Long)].collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_mix_").toString
    val (ratesDir, outDir, ckpt) = (s"$tmp/rates", s"$tmp/out", s"$tmp/ckpt")

    // rates from the reference corpus, budget ~2.7x the corpus so tail
    // sources land above 100 pct (multi-epoch) — persisted as the
    // stream's stored artifact
    val rates = Dedup.temperatureMixEpochRates(docsDf, "source",
      col("n_chars"), alpha = 0.5, budget = 400000L, maxEpochs = 3)
    rates.write.parquet(ratesDir)
    assert(rates.filter(col("pct") > 100).count() > 0) // epochs are live

    val input = MemoryStream[(Long, String, Long)]
    val q = MixIngest.start(
      input.toDF().toDF("doc_id", "source", "n_chars"),
      ratesDir, outDir, ckpt)
    try {
      docs.grouped(math.max(docs.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(outDir)
      .collect().map(_.toSeq).toSet
    val batch = Dedup.weightedSampleWithEpochs(docsDf, "doc_id", "source",
      spark.read.parquet(ratesDir))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
    // the mixture actually multiplies: more output rows than documents,
    // and at least one doc carries epoch >= 1
    assert(batch.size > docs.size)
    assert(spark.read.parquet(outDir).filter(col("epoch") >= 1).count() > 0)

    // replay + compact: a re-delivered chunk appends duplicate
    // (id, epoch) rows; compact rewrites to the documented reader
    // dedup key and the exact relation is unchanged
    MixIngest.ingestBatch(
      docs.take(3).toDF("doc_id", "source", "n_chars"),
      ratesDir, outDir, "doc_id", "source")
    val rawBefore = spark.read.parquet(outDir).count()
    MixIngest.compact(spark, outDir)
    assert(spark.read.parquet(outDir).count() < rawBefore,
      "replayed rows should collapse")
    assert(spark.read.parquet(outDir).collect().map(_.toSeq).toSet ==
      batch, "compact changed the mixed corpus")
  }
}
