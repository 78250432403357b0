package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import java.sql.Timestamp

/** Pins the r13 timestamp-boundary contract: every operator that
  * consumes event time must produce IDENTICAL results whether the
  * column arrives as TIMESTAMP (LTZ) or TIMESTAMP_NTZ — the fixture
  * drifted between those encodings once (r12, red gate) and must never
  * break the engine again. Sessions pin UTC, so the two encodings carry
  * the same wall-clock values.
  */
class NtzRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("events fixture arrives normalized to TimestampType") {
    val e = graft.Tables.events(spark, sf0001)
    assert(e.schema("ts").dataType == TimestampType)
  }

  test("rangeJoin: NTZ inputs produce the LTZ result") {
    val rows = Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:04:00"),
      ts("2024-01-01 10:05:00")).toDF("ts")
    val ivals = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")))
      .toDF("id", "s", "e")
    def asNtz(df: org.apache.spark.sql.DataFrame, cols: String*) =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampNTZType)))
    val ltz = Joins.rangeJoin(rows, "ts", ivals, "s", "e", 300000L)
      .select("id", "ts").collect().map(_.toSeq).toSet
    val ntz = Joins.rangeJoin(asNtz(rows, "ts"), "ts",
        asNtz(ivals, "s", "e"), "s", "e", 300000L)
      .select("id", "ts").collect()
      .map(r => Seq(r.getLong(0),
        Timestamp.valueOf(r.getAs[java.time.LocalDateTime](1)))).toSet
    assert(ltz == ntz && ltz.size == 2) // [start, end): 2 of 3 rows
  }

  test("windowedCounts: NTZ event time is normalized before the watermark") {
    val events = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:20:00"), "click", 2.0),
      (ts("2024-01-01 11:10:00"), "view", 4.0))
      .toDF("ts", "event_type", "value")
    val ntz = events.withColumn("ts", col("ts").cast(TimestampNTZType))
    // batch mode exercises the same plan; an un-normalized NTZ column
    // fails analysis with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    val a = graft.streaming.EventStreams.windowedCounts(events, "1 hour")
      .select("event_type", "n", "sum_value").collect().map(_.toSeq).toSet
    val b = graft.streaming.EventStreams.windowedCounts(ntz, "1 hour")
      .select("event_type", "n", "sum_value").collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("asofBackward: NTZ key timestamps order identically") {
    val purchases = Seq((1L, 7L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    val clicks = Seq((7L, ts("2024-01-01 11:59:00")))
      .toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    val out = Joins.asofBackward(purchases, clicks, "user_id", "ts", "prior")
      .select("prior").collect()
    assert(out.length == 1 &&
      out.head.getAs[java.time.LocalDateTime](0) ==
        ts("2024-01-01 11:59:00").toLocalDateTime)
  }
}
