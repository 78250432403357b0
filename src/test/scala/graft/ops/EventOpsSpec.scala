package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0, """{"k": 1}"""),
    (2L, ts("2024-01-01 10:55:00"), 7L, "click", 2.0, """{"k": 2}"""),
    (3L, ts("2024-01-01 11:10:00"), 7L, "view", 4.0, """{"k": 3}"""),
    (4L, ts("2024-01-01 13:00:00"), 7L, "click", 8.0, """{"k": 4}"""),
    (5L, ts("2024-01-01 10:20:00"), 9L, "click", 16.0, """{"k": 5}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("tumbling windows: hour-aligned, per event_type") {
    val out = EventOps.tumbling(events, "1 hour")
      .as[(Timestamp, Timestamp, String, Long, Double)].collect()
      .map(r => (r._1.toString, r._3) -> (r._4, r._5)).toMap
    assert(out(("2024-01-01 10:00:00.0", "click")) == (3L, 19.0)) // 1+2+16
    assert(out(("2024-01-01 11:00:00.0", "view")) == (1L, 4.0))
    assert(out(("2024-01-01 13:00:00.0", "click")) == (1L, 8.0))
  }

  test("sliding windows: every event lands in exactly width/slide windows") {
    val out = EventOps.sliding(events, "1 hour", "30 minutes")
      .as[(Timestamp, Timestamp, String, Long, Double)].collect()
    assert(out.map(_._4).sum == events.count() * 2) // 2 windows per event
    // the 10:05 click is in [09:30,10:30) and [10:00,11:00)
    val w1 = out.filter(r => r._1.toString == "2024-01-01 09:30:00.0" && r._3 == "click")
    assert(w1.length == 1 && w1.head._4 == 2) // 10:05 and 10:20 clicks
  }

  test("sessionize splits on the inactivity gap per user") {
    val out = EventOps.sessionize(events, gapMinutes = 30)
      .as[(Long, Long, Timestamp, Timestamp, Long)].collect()
    val u7 = out.filter(_._1 == 7L).sortBy(_._2)
    // user 7: 10:05 | gap 50m | 10:55+11:10 | gap 110m | 13:00 -> 3 sessions
    assert(u7.length == 3)
    assert(u7(0)._5 == 1 && u7(1)._5 == 2 && u7(2)._5 == 1)
    assert(u7(1)._3.toString == "2024-01-01 10:55:00.0")
    assert(u7(1)._4.toString == "2024-01-01 11:10:00.0")
    assert(out.count(_._1 == 9L) == 1)
  }

  test("sessionize: a gap of exactly the threshold does NOT split") {
    val e = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0, "{}"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(EventOps.sessionize(e, 30).count() == 1)
  }

  test("json props extraction aggregates the typed field") {
    val out = EventOps.jsonPropsAgg(events)
      .as[(String, Long, Long, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out("click") == ("click", 4L, 12L, 1, 5)) // k: 1,2,4,5
    assert(out("view") == ("view", 1L, 3L, 3, 3))
  }

  test("anomalyScores: trailing baseline, no-history and zero-variance emit null z") {
    // type A: counts 1,3,1,3 then a spike of 5; type B: constant 2s
    val rows = (Seq.fill(1)(0) ++ Seq.fill(3)(1) ++ Seq.fill(1)(2) ++
      Seq.fill(3)(3) ++ Seq.fill(5)(4)).zipWithIndex.map { case (h, i) =>
      (i.toLong, ts(f"2024-01-01 $h%02d:30:00"), 1L, "A")
    } ++ (0 to 2).flatMap(h => Seq(
      (100L + h, ts(f"2024-01-01 $h%02d:10:00"), 2L, "B"),
      (200L + h, ts(f"2024-01-01 $h%02d:40:00"), 2L, "B")))
    val e = rows.toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.anomalyScores(e, lookback = 24)
      .as[(Timestamp, String, Long, Option[Double], Option[Double],
        Option[Double])].collect()
      .map(r => (r._2, r._1.toString.take(13)) -> r).toMap
    // first bucket of each type: no trailing history -> null baseline/z
    assert(out(("A", "2024-01-01 00"))._6.isEmpty)
    // A at hour 4: baseline mean(1,3,1,3)=2, sd=1.154701, z=(5-2)/sd
    val a4 = out(("A", "2024-01-01 04"))
    assert(a4._3 == 5 && a4._4.contains(2.0))
    assert(a4._6.exists(z => z > 2.59 && z < 2.61))
    // B: constant history -> zero variance -> null z (never +-inf)
    assert(out(("B", "2024-01-01 02"))._5.contains(0.0)
      && out(("B", "2024-01-01 02"))._6.isEmpty)
  }

  test("retention: epoch-week cohorts, pre-anchor activity excluded, rates vs cohort size") {
    val e = Seq(
      // user 1: signup, active in offset weeks 0, 1, 2
      (1L, ts("2024-01-03 10:00:00"), 1L, "signup"),
      (2L, ts("2024-01-05 10:00:00"), 1L, "click"),   // +2d  -> offset 0
      (3L, ts("2024-01-11 10:00:00"), 1L, "view"),    // +8d  -> offset 1
      (4L, ts("2024-01-18 10:00:00"), 1L, "click"),   // +15d -> offset 2
      // user 2: same cohort week (epoch weeks are Thursday-anchored:
      // the bucket containing Jan 3 runs Dec 28 - Jan 3), only signup
      (5L, ts("2024-01-02 10:00:00"), 2L, "signup"),
      (6L, ts("2024-01-01 09:00:00"), 2L, "click"),   // BEFORE signup: excluded
      // user 3: never signs up -> not in any cohort
      (7L, ts("2024-01-03 10:00:00"), 3L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.retention(e, "signup")
      .as[(Int, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // one cohort week, sized 2
    assert(out.keys.map(_._1).toSet.size == 1)
    val cw = out.keys.head._1
    assert(out((cw, 0)) == ((2L, 2L, 1.0)))   // both active at offset 0
    assert(out((cw, 1)) == ((1L, 2L, 0.5)))
    assert(out((cw, 2)) == ((1L, 2L, 0.5)))
    assert(!out.contains((cw, -1))) // pre-anchor activity never counts
  }

  test("funnel: in-order matching, horizon from the start, broken chains stay broken") {
    val e = Seq(
      // user 1 completes all three in order (click BEFORE the first
      // view must not count; the 09:00 click precedes the funnel)
      (1L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:00:00"), "click"),
      (4L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: click lands OUTSIDE the 2 h horizon from the first view
      (5L, ts("2024-01-01 10:00:00"), "view"),
      (6L, ts("2024-01-01 13:00:00"), "click"),
      (7L, ts("2024-01-01 13:30:00"), "purchase"),
      // user 3: purchase BEFORE the click — order matters, step 2 only
      (8L, ts("2024-01-01 10:00:00"), "view"),
      (9L, ts("2024-01-01 10:20:00"), "purchase"),
      (10L, ts("2024-01-01 10:40:00"), "click"),
      // user 4 never enters the funnel (no view) — absent from output
      (11L, ts("2024-01-01 10:00:00"), "click")
    ).map { case (id, t, et) => (id, t, id % 100 match {
      case n if n <= 4 => 1L
      case n if n <= 7 => 2L
      case n if n <= 10 => 3L
      case _ => 4L
    }, et) }.toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.funnel(e, Seq("view", "click", "purchase"), 120)
      .as[(Long, Int, Timestamp, Timestamp)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._2 == 3 && out(1L)._3 == ts("2024-01-01 10:00:00")
      && out(1L)._4 == ts("2024-01-01 12:00:00"))
    assert(out(2L)._2 == 1 && out(2L)._4 == ts("2024-01-01 10:00:00"))
    assert(out(3L)._2 == 2 && out(3L)._4 == ts("2024-01-01 10:40:00"))
    // the chart face: reaching-at-least counts + conversion vs step 1
    val rep = EventOps.funnelReport(
      EventOps.funnel(e, Seq("view", "click", "purchase"), 120),
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(rep(1)._3 == 3 && rep(2)._3 == 2 && rep(3)._3 == 1)
    assert(rep(2)._4.contains(0.666667) && rep(3)._4.contains(0.333333))
  }

  test("capUserEvents: planted hot user thinned toward the cap, everyone else untouched") {
    import org.apache.spark.sql.functions.col
    // hot user 1 floods 2000 events (one per second); users 2..6 have
    // 40 each — under the cap of 100, so they must pass through intact
    val base = ts("2024-01-01 00:00:00").getTime
    val rows =
      (0 until 2000).map(i =>
        (1L, new Timestamp(base + i * 1000L), "view")) ++
      (2L to 6L).flatMap(u => (0 until 40).map(i =>
        (u, new Timestamp(base + i * 60000L), "view")))
    val ev = rows.toDF("user_id", "ts", "event_type")
    val capped = EventOps.capUserEvents(ev, maxPerUser = 100)
    val byUser = capped.groupBy(col("user_id")).count()
      .as[(Long, Long)].collect().toMap
    // hash-rate thinning lands binomially around the cap (n=2000,
    // p=ceil-rate ~ 0.05): inside [60, 140] with huge margin
    assert(byUser(1L) >= 60 && byUser(1L) <= 140,
      s"hot user kept ${byUser(1L)}")
    (2L to 6L).foreach(u => assert(byUser(u) == 40, s"user $u touched"))
    // deterministic: a second run keeps the identical event set
    val again = EventOps.capUserEvents(ev, maxPerUser = 100)
      .select("user_id", "ts").as[(Long, Timestamp)].collect().toSet
    assert(again ==
      capped.select("user_id", "ts").as[(Long, Timestamp)].collect().toSet)
    // the audit face names exactly the flooded user, with both counts
    val audit = EventOps.capUserEventsAudit(ev, maxPerUser = 100)
      .as[(Long, Long, Long)].collect()
    assert(audit.length == 1 &&
      audit.head == ((1L, 2000L, byUser(1L))))
    // downstream analytics on the capped stream are untouched for
    // everyone under the cap: sessionize emits identical rows there
    val sFull = EventOps.sessionize(ev.filter(col("user_id") =!= 1L), 30)
      .collect().map(_.toSeq).toSet
    val sCapped = EventOps.sessionize(capped, 30)
      .filter(col("user_id") =!= 1L).collect().map(_.toSeq).toSet
    assert(sFull == sCapped)
  }

  test("gapFillDaily zero-fills every (day, type) grid cell") {
    // three-day span with day 2 empty for "click" and days 1,2 empty
    // for "view" — the grid must carry explicit zeros there
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5, "{}"),
      (2L, ts("2024-01-03 10:00:00"), 1L, "click", 2.5, "{}"),
      (3L, ts("2024-01-03 11:00:00"), 2L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.gapFillDaily(ev).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.size == 6, s"3 days x 2 types = 6 cells, got ${got.size}")
    val d0 = 19723 // 2024-01-01 as epoch days
    assert(got((d0, "click")) == (1L, 1.5))
    assert(got((d0 + 1, "click")) == (0L, 0.0))
    assert(got((d0 + 2, "click")) == (1L, 2.5))
    assert(got((d0, "view")) == (0L, 0.0))
    assert(got((d0 + 1, "view")) == (0L, 0.0))
    assert(got((d0 + 2, "view")) == (1L, 4.0))
  }

  test("ewmaDaily runs the recursion over the zero-filled series") {
    // counts per day for "click": 2, 0, 1 -> s1=2, s2=.3*0+.7*2=1.4,
    // s3=.3*1+.7*1.4=1.28 — the gap day DECAYS the average; a sparse
    // formulation would have skipped straight from 2 to s=1.7
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-03 10:00:00"), 1L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.ewmaDaily(ev, alpha = 0.3).collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val d0 = 19723
    assert(got(d0) == 2.0)
    assert(got(d0 + 1) == 1.4)
    assert(got(d0 + 2) == 1.28)
  }

  test("attribution: lookback bounds, tie-break, zero-touch conversions") {
    val ev = Seq(
      // user 1: touch outside lookback, two touches inside (tie on ts),
      // one touch after the conversion (ignored)
      (10L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
      (11L, ts("2024-01-05 09:00:00"), 1L, "click", 0.0, "{}"),
      (12L, ts("2024-01-05 09:00:00"), 1L, "view", 0.0, "{}"),
      (13L, ts("2024-01-05 10:00:00"), 1L, "purchase", 0.0, "{}"),
      (14L, ts("2024-01-05 11:00:00"), 1L, "click", 0.0, "{}"),
      // user 2: conversion with no touch at all
      (20L, ts("2024-01-05 10:00:00"), 2L, "purchase", 0.0, "{}"),
      // an error event must never count as a touch
      (21L, ts("2024-01-05 09:30:00"), 2L, "error", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.attribution(ev, "purchase", Seq("click", "view"), 72)
      .collect().map(r => r.getLong(0) -> r).toMap
    val c1 = out(13L)
    // tie at 09:00 breaks lexicographically: click < view
    assert(c1.getString(3) == "click" && c1.getString(5) == "view")
    assert(c1.getLong(7) == 2) // the 00:00 view is 106h back, outside 72h
    val c2 = out(20L)
    assert(c2.isNullAt(3) && c2.isNullAt(5) && c2.getLong(7) == 0)
  }

  test("attributionCredit: fractional credits sum exactly per channel") {
    val ev = Seq(
      // conv A: 1 click + 1 view -> 0.5 each
      (1L, ts("2024-01-01 09:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 09:30:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-01 10:00:00"), 1L, "purchase", 0.0, "{}"),
      // conv B: 2 clicks -> click 1.0
      (4L, ts("2024-01-02 09:00:00"), 2L, "click", 0.0, "{}"),
      (5L, ts("2024-01-02 09:30:00"), 2L, "click", 0.0, "{}"),
      (6L, ts("2024-01-02 10:00:00"), 2L, "purchase", 0.0, "{}"),
      // conv C: nothing -> no credit
      (7L, ts("2024-01-03 10:00:00"), 3L, "purchase", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps
      .attributionCredit(ev, "purchase", Seq("click", "view"), 72)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(out("click") == (1.5, 2L)) // 0.5 + 1.0, touched convs A and B
    assert(out("view") == (0.5, 1L))
  }

  test("holt fold matches the hand recurrence; forecast extrapolates") {
    import spark.implicits._
    // one type, days 0..2, counts 4, 8, 2 at alpha = beta = 0.5:
    // d0: level 4.0,  trend 0.0
    // d1: level .5*8 + .5*(4+0)   = 6.0;  trend .5*(6-4)+.5*0   = 1.0
    // d2: level .5*2 + .5*(6+1)   = 4.5;  trend .5*(4.5-6)+.5*1 = -0.25
    val filled = Seq((0, "t", 4L), (1, "t", 8L), (2, "t", 2L))
      .toDF("day", "event_type", "n_events")
    val h = EventOps.holtOver(filled, 0.5, 0.5)
      .collect().map(r => r.getInt(1) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(h == Map(0 -> ((4.0, 0.0)), 1 -> ((6.0, 1.0)),
      2 -> ((4.5, -0.25))))
    // forecast h steps from the terminal state: 4.5 - 0.25*h
    val f = EventOps.holtForecast(EventOps.holtOver(filled, 0.5, 0.5), 3)
      .collect().map(r => r.getInt(2) -> (r.getInt(1), r.getDouble(3)))
      .toMap
    assert(f == Map(1 -> ((3, 4.25)), 2 -> ((4, 4.0)), 3 -> ((5, 3.75))))
  }

  test("seqPatterns3 equals the brute triple scan; middle occurrences count") {
    import spark.implicits._
    // user 1 is THE counterexample to a pure first/last formulation:
    // Y at 1,3,5; X at 2; Z at 4 — X->Y->Z holds only through the
    // MIDDLE Y occurrence (min/max sees Y first=1 <= first(X)=2 and
    // Y last=5 >= last(Z)=4 and would answer NO). user 2 is its
    // negative twin (Y at 1,5 only — no witness). user 3 covers
    // repeated types (X->X->X needs three occurrences).
    val ev = Seq(
      (1L, "Y", 1L, 1L), (1L, "X", 2L, 2L), (1L, "Y", 3L, 3L),
      (1L, "Z", 4L, 4L), (1L, "Y", 5L, 5L),
      (2L, "Y", 1L, 6L), (2L, "X", 2L, 7L), (2L, "Z", 4L, 8L),
      (2L, "Y", 5L, 9L),
      (3L, "X", 1L, 10L), (3L, "X", 2L, 11L), (3L, "X", 3L, 12L)
    ).toDF("user_id", "event_type", "tsec", "event_id")
    val got = EventOps.seqPatterns3(ev)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    // brute force: for each user and (a,b,c), exists x<y<z occurrences
    val rows = ev.collect().map(r =>
      (r.getLong(0), r.getString(1), (r.getLong(2), r.getLong(3))))
    val types = rows.map(_._2).distinct
    val want = (for {
      a <- types; b <- types; c <- types
      n = rows.map(_._1).distinct.count { u =>
        val occ = rows.filter(_._1 == u)
        occ.exists { case (_, ta, x) => ta == a &&
          occ.exists { case (_, tb, y) => tb == b &&
            implicitly[Ordering[(Long, Long)]].lt(x, y) &&
            occ.exists { case (_, tc, z) => tc == c &&
              implicitly[Ordering[(Long, Long)]].lt(y, z) } } }
      }
      if n > 0
    } yield (a, b, c) -> n.toLong).toMap
    assert(got == want,
      s"missing ${want.toSet.diff(got.toSet)}, extra ${got.toSet.diff(want.toSet)}")
    assert(got(("X", "Y", "Z")) == 1L) // user 1 only, via the middle Y
    assert(got(("X", "X", "X")) == 1L) // user 3's triple occurrence
  }
}
