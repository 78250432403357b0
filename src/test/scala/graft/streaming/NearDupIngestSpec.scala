package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for streaming near-dup ingestion: feeding the
  * fixture corpus through [[NearDupIngest]] in several micro-batches must
  * produce exactly the candidate set the batch LSH self-join finds on the
  * whole corpus — within-batch pairs from the intra join, cross-batch
  * pairs from the batch-vs-index join, no pair lost or invented.
  */
class NearDupIngestSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched ingestion equals batch LSH candidates on the corpus") {
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(docs.size > 10)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndi_").toString
    val (indexDir, pairsDir, ckpt) =
      (s"$tmp/index", s"$tmp/pairs", s"$tmp/ckpt")

    val input = MemoryStream[(Long, String)]
    val q = NearDupIngest.start(
      input.toDF().toDF("doc_id", "text"), indexDir, pairsDir, ckpt,
      numHashes = 16, bands = 4)
    try {
      // three uneven micro-batches covering the whole corpus
      docs.grouped(math.max(docs.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(pairsDir).distinct()
      .collect().map(_.toSeq).toSet
    val batch = Dedup.lshCandidatePairs(
      docs.toDF("doc_id", "text"), "doc_id", numHashes = 16, bands = 4)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty) // the fixture plants near-dup pairs
    // the persistent index holds every document's band rows exactly once
    val idx = spark.read.parquet(indexDir)
    assert(idx.count() == docs.size.toLong * 4)
    spark.catalog.clearCache()
  }
}
