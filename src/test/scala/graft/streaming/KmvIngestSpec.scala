package graft.streaming

import graft.SparkSpec
import graft.ops.Kmv
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed KMV sketch must equal the batch sketch over everything
  * ingested BIT-FOR-BIT (k-minimum merge is exact), stay exact under
  * at-least-once replay, and survive compaction unchanged.
  */
class KmvIngestSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16
  // two slices, overlapping key ranges, enough keys that both exceed k
  private def rows: Seq[(String, Long)] =
    (1L to 300L).map(i => ("a", i)) ++ (200L to 450L).map(i => ("b", i))

  private def batchSketch = Kmv.sketch(rows.toDF("slice", "key"),
    "slice", "key", K)

  test("streamed sketch equals the batch sketch bit-for-bit") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_kmv_").toString
    val input = MemoryStream[(String, Long)]
    val q = KmvIngest.start(input.toDF().toDF("slice", "key"),
      "slice", "key", s"$tmp/sketch", s"$tmp/ckpt", K)
    try {
      rows.grouped(150).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = KmvIngest.sketch(spark, s"$tmp/sketch", K)
    assert(streamed.exceptAll(batchSketch).isEmpty &&
      batchSketch.exceptAll(streamed).isEmpty)
    // estimates therefore identical too
    val se = Kmv.distinctEstimate(streamed, K).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val be = Kmv.distinctEstimate(batchSketch, K).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(se == be)
  }

  test("replayed epochs and compaction leave the sketch unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kmv2_").toString
    val chunks = rows.grouped(200).toSeq
    chunks.foreach(c =>
      KmvIngest.ingestBatch(c.toDF("slice", "key"), "slice", "key",
        s"$tmp/sketch", K))
    // first chunk delivered again, repartitioned
    KmvIngest.ingestBatch(chunks.head.toDF("slice", "key").repartition(5),
      "slice", "key", s"$tmp/sketch", K)
    val replayed = KmvIngest.sketch(spark, s"$tmp/sketch", K)
    assert(replayed.exceptAll(batchSketch).isEmpty &&
      batchSketch.exceptAll(replayed).isEmpty)
    // compaction shrinks the store to k rows per slice, sketch unchanged
    KmvIngest.compact(spark, s"$tmp/sketch", K)
    assert(spark.read.parquet(s"$tmp/sketch").count() == 2L * K)
    val compacted = KmvIngest.sketch(spark, s"$tmp/sketch", K)
    assert(compacted.exceptAll(batchSketch).isEmpty &&
      batchSketch.exceptAll(compacted).isEmpty)
    // and further ingestion after compaction still converges to batch
    val extra = (400L to 500L).map(i => ("a", i))
    KmvIngest.ingestBatch(extra.toDF("slice", "key"), "slice", "key",
      s"$tmp/sketch", K)
    val grown = KmvIngest.sketch(spark, s"$tmp/sketch", K)
    val full = Kmv.sketch((rows ++ extra).toDF("slice", "key"),
      "slice", "key", K)
    assert(grown.exceptAll(full).isEmpty && full.exceptAll(grown).isEmpty)
  }
}
