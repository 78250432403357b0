package graft.streaming

import graft.SparkSpec
import graft.ops.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}
import java.sql.Timestamp

/** Stream-vs-batch parity for the windowed analytics that need history
  * (anomaly z-scores, per-window top-k): the ingest persists finalized
  * hourly counts; the reports replay the batch scoring functions.
  */
class WindowCountsIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("anomaly + top-k reports equal the batch operators on finalized windows, replay-safe") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_wc_").toString
    val countsDir = s"$tmp/counts"
    // 2 types over 4 hours; a volume spike for clicks in hour 3
    val rows: Seq[(String, Timestamp, Double)] =
      (for {
        h <- 0 until 4
        i <- 0 until (if (h == 3) 9 else if (h == 1) 4 else 3)
      } yield ("click",
        new Timestamp(ts(s"2024-01-01 0$h:00:00").getTime + i * 60000L),
        1.0)) ++
      (for { h <- 0 until 4; i <- 0 until 2 }
        yield ("view",
          new Timestamp(ts(s"2024-01-01 0$h:00:00").getTime +
            i * 60000L + 10000L), 1.0))
    val input = MemoryStream[(String, Timestamp, Double)]
    val q = WindowCountsIngest.start(
      input.toDF().toDF("event_type", "ts", "value"),
      countsDir, s"$tmp/ckpt")
    try {
      // feed in event-time order (a replayed archive / ordered ingest):
      // rows older than the moving watermark would be DROPPED by design
      rows.sortBy(_._2.getTime).grouped(9).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // a far-future sentinel advances the watermark past every real
      // window; its own window stays open and never lands in the series
      input.addData(("sentinel", ts("2024-01-02 12:00:00"), 1.0))
      q.processAllAvailable()
      input.addData(("sentinel", ts("2024-01-02 13:00:00"), 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val batch = rows.toDF("event_type", "ts", "value")
    val batchAnomaly = EventOps.anomalyScores(batch, lookback = 2)
      .collect().map(_.toSeq).toSet
    val batchTopK = EventOps.windowedTopK(batch, "1 hour", 1)
      .collect().map(_.toSeq).toSet
    def reports() = (
      WindowCountsIngest.anomalyReport(spark, countsDir, 2)
        .collect().map(_.toSeq).toSet,
      WindowCountsIngest.topKReport(spark, countsDir, 1)
        .collect().map(_.toSeq).toSet)
    val (sa, st) = reports()
    assert(sa == batchAnomaly, "anomaly stream-vs-batch parity")
    assert(st == batchTopK, "top-k stream-vs-batch parity")
    // the spike hour scored hot: z for clicks at 03:00 is large
    val spikeZ = WindowCountsIngest.anomalyReport(spark, countsDir, 2)
      .filter(col("event_type") === "click" &&
        col("window_start") === lit(ts("2024-01-01 03:00:00")))
      .select("z").as[Option[Double]].head()
    assert(spikeZ.exists(_ > 2.0), s"spike z was $spikeZ")
    // crash-replay of an epoch: re-appending the same finalized rows
    // (new epoch id) must not move either report
    val replay = spark.read.parquet(countsDir).limit(4)
      .withColumn("epoch_id", lit(999L)).localCheckpoint(true)
    replay.write.mode("append").parquet(countsDir)
    val (ra, rt) = reports()
    assert(ra == batchAnomaly && rt == batchTopK, "replay moved a report")

    // compact: the finalized series is content-keyed and immutable, so
    // it fully collapses to one row per (window, type) — reports
    // unchanged, replayed rows gone
    val nSeries = WindowCountsIngest.series(spark, countsDir).count()
    WindowCountsIngest.compact(spark, countsDir)
    assert(spark.read.parquet(countsDir).count() == nSeries,
      "compact must collapse to one row per finalized (window, type)")
    val (ca, ct) = reports()
    assert(ca == batchAnomaly && ct == batchTopK, "compact moved a report")
  }

  test("EWMA report equals batch ewmaDaily on finalized day windows") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_wce_").toString
    val countsDir = s"$tmp/counts"
    // three days, with day 2 EMPTY for "view" — the report must replay
    // the zero-filled decay, not skip the gap
    val rows: Seq[(String, Timestamp, Double)] =
      (for { d <- Seq(1, 2, 3); i <- 0 until d + 1 }
        yield ("click",
          new Timestamp(ts(s"2024-01-0$d 06:00:00").getTime + i * 60000L),
          1.0)) ++
      (for { d <- Seq(1, 3); i <- 0 until 2 }
        yield ("view",
          new Timestamp(ts(s"2024-01-0$d 07:00:00").getTime + i * 60000L),
          1.0))
    val input = MemoryStream[(String, Timestamp, Double)]
    val q = WindowCountsIngest.start(
      input.toDF().toDF("event_type", "ts", "value"),
      countsDir, s"$tmp/ckpt", width = "1 day", watermark = "1 day")
    try {
      rows.sortBy(_._2.getTime).grouped(5).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // sentinels far past the last real day window (+ its watermark
      // lag), both inside the SAME day window so the sentinel's own
      // window is never finalized into the series
      input.addData(("sentinel", ts("2024-01-10 12:00:00"), 1.0))
      q.processAllAvailable()
      input.addData(("sentinel", ts("2024-01-10 13:00:00"), 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val batch = EventOps.ewmaDaily(
      rows.toDF("event_type", "ts", "value")
        .select(lit(0L).as("event_id"), col("ts"), lit(0L).as("user_id"),
          col("event_type"), col("value"), lit("{}").as("props")),
      alpha = 0.3).collect().map(_.toSeq).toSet
    val streamed = WindowCountsIngest.ewmaReport(spark, countsDir, 0.3)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"ewma stream-vs-batch parity:\n$streamed\nvs\n$batch")
    assert(batch.nonEmpty)
    // the Holt face rides the identical finalized series — same parity
    val batchHolt = EventOps.holtDaily(
      rows.toDF("event_type", "ts", "value")
        .select(lit(0L).as("event_id"), col("ts"), lit(0L).as("user_id"),
          col("event_type"), col("value"), lit("{}").as("props")),
      0.5, 0.5).collect().map(_.toSeq).toSet
    val streamedHolt = WindowCountsIngest.holtReport(spark, countsDir, 0.5, 0.5)
      .collect().map(_.toSeq).toSet
    assert(streamedHolt == batchHolt)
  }
}
