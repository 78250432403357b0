package graft.streaming

import graft.SparkSpec
import graft.ops.Ivm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The continuously-maintained view must equal the batch recompute over
  * everything ingested, bit-for-bit, including under at-least-once
  * replay — and compaction must not change it.
  */
class IvmIngestSpec extends SparkSpec {
  import spark.implicits._

  private def rows: Seq[(String, Double)] =
    (1 to 120).map(i => (s"g${i % 5}", i * 1.25)) ++
      Seq(("g0", -3.5), ("g9", 0.0))

  private def batchView = Ivm.readView(
    Ivm.partials(rows.toDF("g", "v"), Seq("g"), "v"))

  private def same(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("streamed view equals the batch recompute") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivm_").toString
    val input = MemoryStream[(String, Double)]
    val q = IvmIngest.start(input.toDF().toDF("g", "v"), Seq("g"), "v",
      s"$tmp/view", s"$tmp/ckpt")
    try {
      rows.grouped(50).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(same(IvmIngest.view(spark, s"$tmp/view", Seq("g")), batchView))
  }

  test("replayed epochs cannot inflate sums; compaction is invisible") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivm2_").toString
    val chunks = rows.grouped(40).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      IvmIngest.ingestBatch(c.toDF("g", "v"), Seq("g"), "v",
        s"$tmp/view", i.toLong)
    }
    // epoch 0 delivered twice more (same content, different partitioning)
    IvmIngest.ingestBatch(chunks.head.toDF("g", "v").repartition(7),
      Seq("g"), "v", s"$tmp/view", 0L)
    IvmIngest.ingestBatch(chunks.head.toDF("g", "v"), Seq("g"), "v",
      s"$tmp/view", 0L)
    assert(same(IvmIngest.view(spark, s"$tmp/view", Seq("g")), batchView))
    // two different epochs carrying IDENTICAL content must BOTH count
    // (the reason dedup is epoch-keyed, not value-keyed)
    val twice = Seq(("dup", 1.0))
    IvmIngest.ingestBatch(twice.toDF("g", "v"), Seq("g"), "v",
      s"$tmp/view", 100L)
    IvmIngest.ingestBatch(twice.toDF("g", "v"), Seq("g"), "v",
      s"$tmp/view", 101L)
    val dup = IvmIngest.view(spark, s"$tmp/view", Seq("g"))
      .filter(col("g") === "dup").collect().head
    assert(dup.getLong(1) == 2L && dup.getDouble(2) == 2.0)
    // compaction: physical rows shrink, the view is unchanged
    // (materialize `before` — its lazy plan would reference the
    // pre-compaction files the swap deletes)
    val before = IvmIngest.view(spark, s"$tmp/view", Seq("g"))
      .collect().map(_.toSeq).toSet
    val nBefore = spark.read.parquet(s"$tmp/view").count()
    IvmIngest.compact(spark, s"$tmp/view", Seq("g"))
    assert(spark.read.parquet(s"$tmp/view").count() < nBefore)
    assert(IvmIngest.view(spark, s"$tmp/view", Seq("g"))
      .collect().map(_.toSeq).toSet == before)
  }
}
