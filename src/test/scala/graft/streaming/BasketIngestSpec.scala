package graft.streaming

import graft.SparkSpec
import graft.ops.MarketBasket
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed frequent-pair report must equal the batch
  * `frequentPairs` over every basket ingested — supports and co-counts
  * are additive over disjoint basket sets (baskets arrive whole per
  * epoch) — and stay exact under replay and compaction.
  */
class BasketIngestSpec extends SparkSpec {
  import spark.implicits._

  // 30 baskets over 12 items, sizes 2-5, deterministic contents
  private def rows: Seq[(Long, Long)] =
    (1L to 30L).flatMap { b =>
      (0L until (2 + b % 4)).map(i => b -> ((b * 7 + i * 3) % 12))
    }

  private def batchPairs = MarketBasket
    .frequentPairs(rows.toDF("basket", "item"), "basket", "item", 3)
    .collect().map(_.toSeq).toSet

  test("streamed report equals batch frequentPairs (whole baskets/epoch)") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_bsk_").toString
    val input = MemoryStream[(Long, Long)]
    val q = BasketIngest.start(input.toDF().toDF("basket", "item"),
      "basket", "item", s"$tmp/store", s"$tmp/ckpt")
    try {
      // groups of whole baskets: 10 baskets per chunk
      rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2)
        .grouped(10).foreach { chunk =>
          input.addData(chunk.flatten: _*)
          q.processAllAvailable()
        }
    } finally q.stop()
    val streamed = BasketIngest.report(spark, s"$tmp/store", 3)
      .collect().map(_.toSeq).toSet
    assert(streamed == batchPairs && batchPairs.nonEmpty)
  }

  test("replay cannot double-count; compaction is invisible; cap audits") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bsk2_").toString
    val chunks = rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2)
      .grouped(10).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      BasketIngest.ingestBatch(c.flatten.toDF("basket", "item"),
        "basket", "item", s"$tmp/store", i.toLong)
    }
    // epoch 0 redelivered, repartitioned
    BasketIngest.ingestBatch(chunks.head.flatten.toDF("basket", "item")
      .repartition(5), "basket", "item", s"$tmp/store", 0L)
    def rep() = BasketIngest.report(spark, s"$tmp/store", 3)
      .collect().map(_.toSeq).toSet
    assert(rep() == batchPairs)
    val nBefore = spark.read.parquet(s"$tmp/store/pairs").count()
    BasketIngest.compact(spark, s"$tmp/store")
    assert(spark.read.parquet(s"$tmp/store/pairs").count() < nBefore)
    assert(rep() == batchPairs)
    // a mega-basket in a later epoch is dropped AND audited
    val mega = (0L until 8L).map(i => 99L -> i)
    BasketIngest.ingestBatch(mega.toDF("basket", "item"), "basket", "item",
      s"$tmp/store", 50L, maxBasketSize = 5)
    assert(rep() == batchPairs) // nothing from the dropped basket
    val audit = spark.read.parquet(s"$tmp/store/capped").collect()
    assert(audit.length == 1 && audit.head.getLong(0) == 99L &&
      audit.head.getLong(1) == 8L)
  }

  test("an item infrequent per-epoch but frequent overall still surfaces") {
    // item pair (1,2) appears once per epoch across 3 epochs — any
    // per-epoch closure prune would kill it; report-time prune must not
    val tmp = java.nio.file.Files.createTempDirectory("graft_bsk3_").toString
    (0 until 3).foreach { i =>
      BasketIngest.ingestBatch(
        Seq((100L + i) -> 1L, (100L + i) -> 2L).toDF("basket", "item"),
        "basket", "item", s"$tmp/store", i.toLong)
    }
    val out = BasketIngest.report(spark, s"$tmp/store", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 2L, 3L, 3L, 3L)))
  }
}
