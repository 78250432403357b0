package graft.streaming

import graft.SparkSpec
import graft.ops.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class RetentionIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // Users signing up at staggered MID-DAY seconds across two cohort
  // weeks, then active across several weeks — including user-days that
  // straddle a week boundary relative to the signup second (the case
  // day-granular keys cannot bucket), repeat visits within a day, a
  // user active BEFORE signing up (the tsec >= t0 filter), and a user
  // who never signs up (excluded by the inner join).
  private def events: Seq[(Long, Timestamp, String)] = {
    val base = ts("2024-01-03 13:47:11").getTime
    val signups = for (u <- 0L until 6L) yield
      (u, new Timestamp(base + u * 90000000L), "signup")
    val visits = for {
      u <- 0L until 6L; w <- 0 until 4; k <- 0 until 3
    } yield (u, new Timestamp(base + u * 90000000L +
      w * 604800000L + k * 43000000L - (if (k == 0) 50000000L else 0L)),
      "view")
    val never = for (d <- 0 until 5) yield
      (9L, new Timestamp(base + d * 86400000L), "view")
    signups ++ visits ++ never
  }

  test("streamed retention equals the batch operator bit-for-bit, replay + compaction safe") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ret_").toString
    val dir = s"$tmp/retention"
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = RetentionIngest.start(
      input.toDF().toDF("user_id", "ts", "event_type"), dir, s"$tmp/ckpt")
    try {
      events.grouped(11).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val batch = EventOps.retention(
        events.toDF("user_id", "ts", "event_type"), "signup")
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    def streamed() = RetentionIngest.report(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed() == batch)
    // at-least-once replay of an epoch: min/max state absorbs it
    val replay = events.slice(11, 22).toDF("user_id", "ts", "event_type")
    RetentionIngest.ingestBatch(replay, dir, 1L)
    assert(streamed() == batch, "replayed epoch moved the triangle")
    // compaction shrinks the state table and changes nothing
    val before = spark.read.parquet(dir).count()
    RetentionIngest.compact(spark, dir)
    assert(spark.read.parquet(dir).count() < before)
    assert(streamed() == batch, "compaction moved the triangle")
    // compaction twice (fold-safety — min/max are idempotent)
    RetentionIngest.compact(spark, dir)
    assert(streamed() == batch, "second compaction moved the triangle")
  }

  test("report matches batch on the sf0.001 events fixture") {
    val ev = graft.Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_type")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ret2_").toString
    // three hash-split epochs, out of order (later signups can arrive
    // before earlier activity — min-merge makes order irrelevant)
    Seq(2, 0, 1).foreach { b =>
      RetentionIngest.ingestBatch(
        ev.filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.lit(3)) === b),
        s"$tmp/state", b.toLong)
    }
    val batch = EventOps.retention(ev, "signup")
      .collect().map(_.toSeq).toSet
    val streamed = RetentionIngest.report(spark, s"$tmp/state")
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && streamed == batch)
  }
}
