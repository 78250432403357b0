package graft.streaming

import graft.SparkSpec
import graft.ops.CountMin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed CMS must equal the batch sketch over everything
  * ingested — merge is exact counter addition — and stay exact under
  * at-least-once replay of any epoch.
  */
class CountMinIngestSpec extends SparkSpec {
  import spark.implicits._

  private def keys: Seq[String] =
    (for { i <- 1 to 40; _ <- 1 to i } yield s"k$i").toList

  test("streamed sketch equals the batch build over the whole stream") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_").toString
    val input = MemoryStream[String]
    val q = CountMinIngest.start(input.toDF().toDF("k"), "k",
      s"$tmp/sketch", s"$tmp/ckpt")
    try {
      keys.grouped(200).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = CountMinIngest.sketch(spark, s"$tmp/sketch")
    val batch = CountMin.build(keys.toDF("k"), "k")
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    // and therefore every estimate matches the batch path
    val est = CountMin.estimate(keys.distinct.toDF("k"), "k", streamed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size }
    exact.foreach { case (k, n) => assert(est(k) >= n) }
  }

  test("a replayed epoch cannot inflate the counters") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms2_").toString
    val chunks = keys.grouped(300).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      CountMinIngest.ingestBatch(c.toDF("k"), "k", s"$tmp/sketch", i.toLong)
    }
    // epoch 0 delivered again (same content, possibly repartitioned)
    CountMinIngest.ingestBatch(chunks.head.toDF("k").repartition(5), "k",
      s"$tmp/sketch", 0L)
    val streamed = CountMinIngest.sketch(spark, s"$tmp/sketch")
    val batch = CountMin.build(keys.toDF("k"), "k")
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    // total mass check: sum of any hash row equals the stream length
    val rowMass = streamed.groupBy(col("row_i"))
      .agg(sum(col("cnt")).as("m")).collect().map(_.getLong(1))
    assert(rowMass.forall(_ == keys.size.toLong))

    // compact: replay-dedup fixpoint, invisible to reads, epochs kept
    val rawBefore = spark.read.parquet(s"$tmp/sketch").count()
    CountMinIngest.compact(spark, s"$tmp/sketch")
    val raw = spark.read.parquet(s"$tmp/sketch")
    assert(raw.count() < rawBefore, "replayed cells should collapse")
    assert(raw.select("epoch_id").distinct().count() == chunks.size,
      "compact must preserve epoch structure")
    val after = CountMinIngest.sketch(spark, s"$tmp/sketch")
    assert(after.exceptAll(batch).isEmpty && batch.exceptAll(after).isEmpty,
      "compact changed the lifetime sketch")
    // further ingest converges identically post-compaction
    CountMinIngest.ingestBatch(Seq("zz1", "zz2").toDF("k"), "k",
      s"$tmp/sketch", chunks.size.toLong)
    val batch2 = CountMin.build((keys ++ Seq("zz1", "zz2")).toDF("k"), "k")
    val after2 = CountMinIngest.sketch(spark, s"$tmp/sketch")
    assert(after2.exceptAll(batch2).isEmpty &&
      batch2.exceptAll(after2).isEmpty)
  }
}
