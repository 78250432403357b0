package graft.streaming

import graft.SparkSpec
import graft.ops.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class ActivityIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 3 days, overlapping users, repeat visits within a day
  private def events: Seq[(Long, Timestamp)] =
    (for { d <- 0 until 3; u <- 0L until (4L + d); r <- 0 to (u % 2).toInt }
      yield (u, new Timestamp(ts("2024-01-01 06:00:00").getTime +
        d * 86400000L + r * 3600000L + u * 60000L)))

  test("streamed DAU equals the batch operator bit-for-bit, replay + compaction safe") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_act_").toString
    val dir = s"$tmp/activity"
    val input = MemoryStream[(Long, Timestamp)]
    val q = ActivityIngest.start(
      input.toDF().toDF("user_id", "ts"), dir, s"$tmp/ckpt")
    try {
      events.grouped(7).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val batch = EventOps.dailyActive(events.toDF("user_id", "ts"))
      .collect().map(_.toSeq).toSet
    def streamed() = ActivityIngest.report(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed() == batch)
    // at-least-once replay of an epoch: neither keys nor count partials
    // may move the series
    val replay = events.slice(7, 14).toDF("user_id", "ts")
    ActivityIngest.ingestBatch(replay, dir, 1L)
    assert(streamed() == batch, "replayed epoch moved the series")
    // compaction shrinks the key table and changes nothing — count
    // partials from distinct epochs survive even when identical
    val before = spark.read.parquet(dir).count()
    ActivityIngest.compactKeys(spark, dir)
    assert(spark.read.parquet(dir).count() < before)
    assert(streamed() == batch, "compaction moved the series")
  }
}
