package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterparts of the batch window operators in
  * [[graft.ops.EventOps]]. Spark's unified API means the aggregation
  * expressions are IDENTICAL to the batch path — `readStream` swaps in for
  * `read`, plus a watermark for state eviction; StreamingSpec asserts
  * batch/stream result parity on the fixture events.
  *
  * Scale posture: windowed aggregation state is (window x key)-sized and
  * evicted by the watermark; sessionization state is one small record per
  * active (user) group, timed out on event-time. Both shuffle only
  * partial aggregates / group keys — the raw stream is never buffered
  * unbounded.
  */
object EventStreams {

  /** Watermarks require `TimestampType`
    * (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE` otherwise); a file source
    * whose schema carries `TIMESTAMP_NTZ` — e.g. staged from a naive-
    * micros fixture — is normalized here so every streaming face is
    * robust to the arrival encoding, mirroring [[graft.Tables]]'
    * batch-side boundary. Sessions pin TZ=UTC, so the cast is
    * wall-clock-preserving.
    */
  private def eventTime(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }

  /** Tumbling (or sliding, when `slide` is set) windowed counts + sums
    * with a watermark. Works on a streaming OR batch DataFrame — same
    * plan, which is exactly the point.
    */
  def windowedCounts(events: DataFrame, width: String,
                     slide: Option[String] = None,
                     watermark: String = "1 hour"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col("ts"), width, s)
      case None => window(col("ts"), width)
    }
    eventTime(events, "ts").withWatermark("ts", watermark)
      .groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming exact dedup: drop rows whose content key was already seen
    * within the watermark horizon (`dropDuplicatesWithinWatermark` keys
    * the state on the md5 content key and evicts it as event time
    * advances — bounded state, unlike a naive global distinct). The
    * streaming face of [[graft.ops.Dedup.exact]] for ingestion pipelines.
    */
  def dedupStream(docs: DataFrame, textCol: String,
                  tsCol: String, watermark: String): DataFrame =
    eventTime(docs, tsCol)
      .withColumn("text_key",
        org.apache.spark.sql.functions.md5(lower(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_key")

  /** Stream-static enrichment: left-join a (small, broadcastable) static
    * dimension onto the stream. Spark re-plans the static side per
    * micro-batch, so the join is a map-side broadcast lookup — no
    * streaming state, no shuffle of the stream. The standard shape for
    * attaching user/source/catalog attributes during ingestion; for
    * dimensions too big to broadcast, pre-bucket both sides
    * ([[graft.sources.BucketedTables]]) and let the join co-locate.
    */
  /** STREAM-STREAM interval join — the streaming face of
    * [[graft.ops.Joins.rangeJoin]]: pair every left event with the right
    * events whose `rightTs` falls in `[leftTs, leftTs + window)` (e.g.
    * clicks within 5 minutes after each error). Spark REQUIRES an
    * equality predicate on stream-stream joins, which is exactly what
    * the batch operator's bucket grid provides: the left side explodes
    * into the two window-bucket cells its interval can overlap, the
    * right side maps to its one cell, the join is an EQUI join on the
    * cell (so join state is hash-partitioned by bucket, same as the
    * batch shuffle), and the exact range predicate rides in the join
    * condition — where Spark ALSO reads it as the cross-stream time
    * constraint that, with both watermarks, bounds state eviction to
    * watermark delay + window. One mechanism serves both engines'
    * requirements. Inner rows emit as soon as both sides arrive; a
    * (left, right) pair can only meet in the right event's single cell,
    * so no dedup is needed. Column names must differ across sides
    * (Spark's cross-stream constraint requirement).
    */
  def intervalJoinStream(left: DataFrame, leftTs: String,
                         right: DataFrame, rightTs: String,
                         windowMinutes: Int,
                         watermark: String = "1 hour",
                         joinType: String = "inner"): DataFrame = {
    val bucketMs = windowMinutes * 60000L
    def bucketOf(c: Column): Column =
      floor(unix_micros(c.cast("timestamp")) / (bucketMs * 1000.0))
        .cast("long")
    // the two-cell coverage explode lives on the RIGHT side (a right
    // event's bucket and its predecessor — the only two cells a left
    // interval overlapping it can start in), so each LEFT row is ONE
    // state row: `left_outer` then null-extends an unmatched left
    // exactly once when the watermark passes its interval end (an
    // exploded left would emit one null row per cell). A (left, right)
    // pair still meets in exactly one exploded cell — rb and rb-1 can
    // never both equal lb — so inner results are identical to the
    // pre-r14 left-exploded formulation (StreamingSpec parity).
    val l = eventTime(left, leftTs).withWatermark(leftTs, watermark)
      .withColumn("__lb", bucketOf(col(leftTs)))
    val r = eventTime(right, rightTs).withWatermark(rightTs, watermark)
      .withColumn("__rb", explode(array(
        bucketOf(col(rightTs)) - lit(1L), bucketOf(col(rightTs)))))
    l.join(r,
        col("__lb") === col("__rb") &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) < col(leftTs) +
            expr(s"INTERVAL $windowMinutes MINUTES"),
        joinType)
      .drop("__lb", "__rb")
  }

  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class SessionBuf(sessions: Seq[SessionState])
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Gap-based sessionization as custom streaming state
    * (`flatMapGroupsWithState` + event-time timeout) — the streaming
    * analogue of [[graft.ops.EventOps.sessionize]], with BATCH PARITY for
    * every event the engine admits (ts above the watermark).
    *
    * State per user is the list of CANDIDATE sessions (merged on the gap,
    * exactly the batch fold). A candidate is emitted only once the
    * watermark passes `end + gap`: any still-admissible event has
    * `ts > watermark >= end + gap`, so nothing can extend or merge into it
    * any more. Emitting earlier (the previous revision closed a session as
    * soon as a later in-batch event was a gap ahead) diverges from batch
    * when an out-of-order event inside the gap arrives in a later
    * micro-batch. Events at or below the watermark are dropped by the
    * engine before this function runs — standard Spark late-data
    * semantics, the one contract batch mode cannot mirror.
    *
    * Scale posture: state is a handful of candidate sessions per ACTIVE
    * user (bounded by watermark delay / gap), timed out on event time; the
    * raw stream is never buffered.
    */
  final case class FunnelEvent(user_id: Long, step: Int,
                               ts: java.sql.Timestamp)
  final case class FunnelHit(step: Int, ts: Long)
  final case class FunnelBuf(hits: Seq[FunnelHit])
  final case class FunnelRow(user_id: Long, steps_completed: Int,
                             funnel_start: java.sql.Timestamp,
                             last_step_ts: java.sql.Timestamp)

  /** Streaming ordered funnel — the streaming face of
    * [[graft.ops.EventOps.funnel]], with BATCH PARITY for every ADMITTED
    * event, where admitted is enforced HERE, not hedged onto the engine:
    * a row below the current watermark when its micro-batch runs is
    * dropped inside the state function (`flatMapGroupsWithState` does
    * not do this itself), so a late step-0 row can never recreate
    * removed state and double-emit a finalized funnel. Per user,
    * step-typed events are buffered until the watermark passes
    * `funnel_start + horizon` — at that point nothing admissible can
    * change the outcome (any event inside the horizon is below the
    * watermark, and a new anchor would need `ts >= wm > start`), so the
    * funnel is replayed over the buffer with the batch rule (earliest
    * occurrence strictly after the previous match, inside the horizon
    * of the start) and emitted EXACTLY ONCE, final.
    *
    * Buffer trimming keeps state bounded: with an anchor, only events
    * inside the current anchor's horizon can ever match (future anchors
    * are earlier, shrinking the window); without one, only events still
    * above the watermark can outlive a future anchor. State per active
    * user is therefore bounded by the step events inside
    * (watermark delay + horizon) — the raw stream is never buffered
    * unbounded. Users who never produce the first step emit nothing
    * and their state self-clears as the watermark advances.
    */
  def funnelStream(events: DataFrame, steps: Seq[String],
                   horizonMinutes: Int,
                   watermark: String = "1 hour"): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val horizonMs = horizonMinutes * 60000L
    val stepOf = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(acc)
      }
    eventTime(events, "ts")
      .filter(col("event_type").isin(steps.map(x => x: Any): _*))
      .select(col("user_id"), stepOf.as("step"), col("ts"))
      .as[FunnelEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[FunnelBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          // HARD late-data guarantee: flatMapGroupsWithState does NOT
          // drop below-watermark rows itself, and a late step-0 row
          // slipping in after state.remove() would recreate state and
          // emit a SECOND final row for the same funnel. Dropping
          // anything below the current watermark here makes the
          // exactly-once final emission a guarantee, not a hedge.
          val buf = state.getOption.map(_.hits).getOrElse(Seq.empty) ++
            it.filter(_.ts.getTime >= wm)
              .map(e => FunnelHit(e.step, e.ts.getTime))
          val anchor = buf.iterator.filter(_.step == 0).map(_.ts)
            .minOption
          anchor match {
            case Some(start) if start + horizonMs < wm =>
              // final: replay the batch matching rule over the buffer
              var last = start
              var completed = 1
              var k = 1
              var broken = false
              while (k < steps.length && !broken) {
                buf.iterator
                  .filter(h => h.step == k && h.ts > last &&
                    h.ts <= start + horizonMs)
                  .map(_.ts).minOption match {
                  case Some(t) => last = t; completed += 1; k += 1
                  case None => broken = true
                }
              }
              state.remove()
              Iterator.single(FunnelRow(uid, completed,
                new java.sql.Timestamp(start),
                new java.sql.Timestamp(last)))
            case Some(start) =>
              val keep = buf.filter(_.ts <= start + horizonMs)
              state.update(FunnelBuf(keep))
              state.setTimeoutTimestamp(
                math.max(start + horizonMs + 1, wm + 1))
              Iterator.empty
            case None =>
              // no anchor: an event at ts < wm can never match a future
              // anchor (which must sit at >= wm, and matches are
              // strictly after it)
              val keep = buf.filter(_.ts >= wm)
              if (keep.isEmpty) state.remove()
              else {
                state.update(FunnelBuf(keep))
                state.setTimeoutTimestamp(wm + 1)
              }
              Iterator.empty
          }
      }
  }

  final case class AttrEvent(event_id: Long, user_id: Long,
                             event_type: String, ts: java.sql.Timestamp)
  final case class AttrTouch(tsec: Long, typ: String)
  final case class AttrPending(id: Long, tsec: Long)
  final case class AttrState(touches: Seq[AttrTouch],
                             pending: Seq[AttrPending])
  final case class AttributionRow(conv_event_id: Long, user_id: Long,
      conv_tsec: Long,
      first_touch: Option[String], first_touch_tsec: Option[Long],
      last_touch: Option[String], last_touch_tsec: Option[Long],
      n_touches: Long)

  /** Streaming face of [[graft.ops.EventOps.attribution]]: per user,
    * touch events buffer until a conversion becomes FINAL — the
    * watermark has passed its second, so no admissible touch can still
    * land inside its window — and the attribution row is emitted
    * exactly once, identical to the batch rule over admitted events
    * (parity spec-pinned, including the tie-break on (second, type)).
    *
    * The funnelStream late-data lesson applies verbatim: rows below the
    * current watermark are dropped INSIDE the state function, so a late
    * touch can neither resurrect a finalized conversion nor change its
    * already-emitted row. All window arithmetic runs on SECONDS (the
    * batch operator's `unix_timestamp` grid), so sub-second arrival
    * order can never split batch and stream.
    *
    * State per active user is bounded: touches older than
    * `min(watermark, oldest pending conversion) - lookback` can never
    * join a window again and are trimmed every invocation; pending
    * conversions leave state the moment they finalize. Event-time
    * timeouts fire finalization for users who go quiet.
    */
  def attributionStream(events: DataFrame, convType: String,
      touchTypes: Seq[String], lookbackHours: Int,
      watermark: String = "1 hour"): Dataset[AttributionRow] = {
    import events.sparkSession.implicits._
    val lookbackSec = lookbackHours * 3600L
    eventTime(events, "ts")
      .filter(col("event_type") === convType ||
        col("event_type").isin(touchTypes: _*))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[AttrEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttributionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[AttrState]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(AttrState(Nil, Nil))
          // the hard late-data drop (see funnelStream)
          val fresh = it.filter(_.ts.getTime >= wm).toSeq
          val touches = prev.touches ++ fresh
            .filter(_.event_type != convType)
            .map(e => AttrTouch(e.ts.getTime / 1000, e.event_type))
          val pending = prev.pending ++ fresh
            .filter(_.event_type == convType)
            .map(e => AttrPending(e.event_id, e.ts.getTime / 1000))
          // a conversion is final once the watermark clears its second:
          // any touch with tsec <= conv_tsec would now be dropped above
          val (ready, waiting) =
            pending.partition(p => (p.tsec + 1) * 1000 <= wm)
          val out = ready.sortBy(p => (p.tsec, p.id)).map { p =>
            val inWin = touches
              .filter(t => t.tsec <= p.tsec && t.tsec >= p.tsec - lookbackSec)
            val ordered = inWin.sortBy(t => (t.tsec, t.typ))
            AttributionRow(p.id, uid, p.tsec,
              ordered.headOption.map(_.typ),
              ordered.headOption.map(_.tsec),
              ordered.lastOption.map(_.typ),
              ordered.lastOption.map(_.tsec),
              inWin.size.toLong)
          }
          // trim: a touch can only ever join a window anchored at
          // tsec >= min(wm, oldest waiting conversion)
          val floorSec =
            (waiting.map(_.tsec) :+ (wm / 1000)).min - lookbackSec
          val keepT = touches.filter(_.tsec >= floorSec)
          if (keepT.isEmpty && waiting.isEmpty) state.remove()
          else {
            state.update(AttrState(keepT, waiting))
            val next = waiting.map(p => (p.tsec + 1) * 1000)
              .minOption.getOrElse(wm + 1)
            state.setTimeoutTimestamp(math.max(next, wm + 1))
          }
          out.iterator
      }
  }

  final case class CapEvent(user_id: Long, event_type: String,
                            ts: java.sql.Timestamp)
  final case class CapState(admitted: Long)

  /** Streaming face of [[graft.ops.EventOps.capUserEvents]] — the
    * bot-flood guard applied AT INGEST, so the per-user state/sort
    * operators downstream never see the flood at all. Per user, the
    * first `maxPerUser` events (event-time order within each
    * micro-batch, arrival order across batches) are admitted; everything
    * after is dropped. State is ONE counter per user (8 bytes — kept
    * for the stream's lifetime deliberately: expiring it would re-admit
    * a returning flooder, exactly the wrong failure mode for a guard).
    *
    * Honest contract vs the batch face: the batch guard thins by
    * CONTENT hash (order-independent, oracle-reproducible); the stream
    * guard caps by ARRIVAL (prefix-biased, deterministic for a given
    * micro-batch sequence). A periodic batch republish with
    * [[graft.ops.EventOps.capUserEvents]] converges the archive to the
    * batch rule — the same stream-then-republish contract as the dedup
    * ingest faces.
    */
  def capUserEventsStream(events: DataFrame, maxPerUser: Long,
                          watermark: String = "1 hour"): Dataset[CapEvent] = {
    import events.sparkSession.implicits._
    eventTime(events, "ts").selectExpr("user_id", "event_type", "ts")
      .as[CapEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CapState, CapEvent](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[CapState]) =>
          val have = state.getOption.map(_.admitted).getOrElse(0L)
          val room = math.min(math.max(0L, maxPerUser - have),
            Int.MaxValue.toLong).toInt
          val admit = it.toSeq.sortBy(_.ts.getTime).take(room)
          if (admit.nonEmpty) state.update(CapState(have + admit.length))
          admit.iterator
      }
  }

  def sessionizeStream(events: DataFrame, gapMinutes: Int,
                       watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    eventTime(events, "ts").selectExpr("user_id", "ts").as[SessionEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[SessionBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          // batch events as singleton intervals + existing candidates,
          // sorted by start, fold-merged on the gap — the batch split
          val items = (it.map(e =>
            SessionState(e.ts.getTime, e.ts.getTime, 1)).toSeq ++
            state.getOption.map(_.sessions).getOrElse(Seq.empty))
            .sortBy(s => (s.start, s.end))
          val merged = Seq.newBuilder[SessionState]
          var cur: Option[SessionState] = None
          items.foreach { s =>
            cur match {
              case Some(c) if s.start - c.end <= gapMs =>
                cur = Some(SessionState(c.start, math.max(c.end, s.end),
                  c.n + s.n))
              case Some(c) =>
                merged += c
                cur = Some(s)
              case None =>
                cur = Some(s)
            }
          }
          cur.foreach(merged += _)
          // finalized = unreachable by any admissible future event. The
          // engine admits events with ts == watermark (it drops only
          // ts < wm), so a session is safe to emit only when
          // end + gap < wm STRICTLY — at equality an event at exactly
          // end + gap could still arrive and merge in batch mode.
          val (closed, open) = merged.result().partition(_.end + gapMs < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionBuf(open))
            // fire when the watermark can finalize the earliest candidate;
            // the engine requires the timeout to sit strictly above the
            // current watermark, and end + gap == wm is now possible for
            // an open candidate — clamp to wm + 1
            state.setTimeoutTimestamp(
              math.max(open.map(_.end + gapMs).min, wm + 1))
          }
          closed.sortBy(_.start).iterator.map(s =>
            Session(uid, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n))
      }
  }
}
