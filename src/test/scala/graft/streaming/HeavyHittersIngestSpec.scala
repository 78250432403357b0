package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streamed heavy-hitter board must honor the lifetime N/(k+1)
  * guarantee across epochs, and stay inside it under at-least-once
  * replay of any epoch.
  */
class HeavyHittersIngestSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  /** Zipf-ish stream: key i ~ C/i plus one flooder arriving late (the
    * board must pick it up only once it truly dominates). */
  private def events: Seq[String] = {
    val cold = for { i <- 1 to 60; _ <- 1 to (120 / i) } yield s"key_$i"
    val flood = Seq.fill(260)("flooder")
    (cold ++ flood).toList
  }

  private def exact: Map[String, Long] =
    events.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("lifetime guarantee holds across epoch-chunked ingestion") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_hh_").toString
    val input = MemoryStream[String]
    val q = HeavyHittersIngest.start(input.toDF().toDF("k"), "k", K,
      s"$tmp/sketch", s"$tmp/totals", s"$tmp/ckpt")
    try {
      events.grouped(100).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val n = HeavyHittersIngest.totalIngested(spark, s"$tmp/totals")
    assert(n == events.size.toLong)
    val board = HeavyHittersIngest.report(spark, s"$tmp/sketch", K)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(board.size <= K)
    for ((key, cnt) <- exact if cnt * (K + 1) > n) {
      assert(board.contains(key), s"true heavy hitter $key lost from board")
    }
    for ((key, e) <- board) {
      val t = exact(key)
      assert(e <= t && (t - e) * (K + 1) <= n,
        s"$key estimate $e outside [${t - n / (K + 1)}, $t]")
    }
  }

  test("replayed epoch cannot inflate the board or the total") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_hh2_").toString
    val chunks = events.grouped(150).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      HeavyHittersIngest.ingestBatch(c.toDF("k"), "k", K,
        s"$tmp/sketch", s"$tmp/totals", i.toLong)
    }
    val n1 = HeavyHittersIngest.totalIngested(spark, s"$tmp/totals")
    val b1 = HeavyHittersIngest.report(spark, s"$tmp/sketch", K)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // at-least-once: epoch 1 delivered again, byte-identical
    HeavyHittersIngest.ingestBatch(chunks(1).toDF("k"), "k", K,
      s"$tmp/sketch", s"$tmp/totals", 1L)
    val n2 = HeavyHittersIngest.totalIngested(spark, s"$tmp/totals")
    val b2 = HeavyHittersIngest.report(spark, s"$tmp/sketch", K)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n2 == n1, "replay inflated the ingested total")
    assert(b2 == b1, "replay changed the board")

    // compact: replay-dedup fixpoint rewrite of both stores, invisible
    // to the board and the total, epoch structure preserved
    val rawBefore = spark.read.parquet(s"$tmp/sketch").count() +
      spark.read.parquet(s"$tmp/totals").count()
    HeavyHittersIngest.compact(spark, s"$tmp/sketch", s"$tmp/totals")
    val rawAfter = spark.read.parquet(s"$tmp/sketch").count() +
      spark.read.parquet(s"$tmp/totals").count()
    assert(rawAfter < rawBefore, "replayed rows should collapse")
    assert(spark.read.parquet(s"$tmp/totals")
      .select("epoch_id").distinct().count() == chunks.size)
    assert(HeavyHittersIngest.totalIngested(spark, s"$tmp/totals") == n1)
    val b3 = HeavyHittersIngest.report(spark, s"$tmp/sketch", K)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b3 == b1, "compact changed the board")
  }

  test("flooder dominates the final board") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_hh3_").toString
    events.grouped(100).zipWithIndex.foreach { case (c, i) =>
      HeavyHittersIngest.ingestBatch(c.toDF("k"), "k", K,
        s"$tmp/sketch", s"$tmp/totals", i.toLong)
    }
    val board = HeavyHittersIngest.report(spark, s"$tmp/sketch", K)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(board.contains("flooder"))
    assert(board("flooder") == board.values.max)
  }
}
