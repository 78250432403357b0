package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window operators over the `events` table. These are the batch
  * formulations; [[graft.streaming.EventStreams]] runs the identical
  * `window()` expressions under Structured Streaming with watermarks —
  * Spark's unified API means the aggregation code is shared.
  *
  * Scale posture: `window()` is a projection (it assigns 1-2 window
  * structs per row map-side); the groupBy shuffles one partial aggregate
  * per (window, key) per partition, not raw events. Sessionization uses
  * one hash-partition by user_id; per-user state is a sort within the
  * partition (Spark's window-function exec), which AQE splits on skew.
  */
object EventOps {

  /** Tumbling-window counts + sums per event_type (1 row per event). */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window counts + sums: each event lands in width/slide
    * overlapping windows (2 with the 1h/30m defaults).
    */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds `gapMinutes`. Output is one row per session
    * with bounds and event count. Batch analogue of
    * `session_window`/`flatMapGroupsWithState` (see
    * [[graft.streaming.EventStreams.sessionizeStream]]).
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val prev = lag(col("ts"), 1).over(byUser)
    val isNew = when(prev.isNull ||
      col("ts") - prev > expr(s"INTERVAL $gapMinutes MINUTES"), 1).otherwise(0)
    val sid = sum(col("is_new"))
      .over(Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    events.withColumn("is_new", isNew)
      .withColumn("session_id", sid)
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** JSON property extraction + aggregation: `props` is an opaque JSON
    * string column; pull a typed field out with `get_json_object` and
    * aggregate it (the multimodal-metadata access pattern).
    */
  def jsonPropsAgg(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
}
