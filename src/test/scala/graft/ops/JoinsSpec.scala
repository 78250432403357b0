package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof backward join picks the greatest right ts <= left ts per key") {
    val purchases = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00")),
      (3L, 9L, ts("2024-01-01 09:00:00"))) // user 9 has no clicks
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (7L, ts("2024-01-01 09:30:00")),
      (7L, ts("2024-01-01 10:00:00")), // tie with purchase 1: inclusive
      (7L, ts("2024-01-01 11:59:00")),
      (8L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "ts")
    val out = Joins.asofBackward(purchases, clicks, "user_id", "ts", "prior")
      .as[(Long, Long, Timestamp, Option[Timestamp])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L).contains(ts("2024-01-01 10:00:00"))) // equal ts wins
    assert(out(2L).contains(ts("2024-01-01 11:59:00"))) // greatest prior
    assert(out(3L).isEmpty)                             // no prior click
  }

  test("asof value carry: matched right row's columns travel, ties deterministic") {
    val purchases = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00")),
      (3L, 9L, ts("2024-01-01 09:00:00"))) // no prior click
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (7L, ts("2024-01-01 09:30:00"), 101L, 1.5),
      (7L, ts("2024-01-01 11:00:00"), 102L, 2.5),
      (7L, ts("2024-01-01 11:00:00"), 103L, 3.5)) // tie: largest tuple wins
      .toDF("user_id", "ts", "event_id", "value")
    val out = Joins.asofBackwardValues(purchases, clicks, "user_id", "ts",
        Seq("event_id", "value"), prefix = "prior_")
      .as[(Long, Long, Timestamp, Option[Timestamp], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> (r._4, r._5, r._6)).toMap
    assert(out(1L) == ((Some(ts("2024-01-01 09:30:00")), Some(101L), Some(1.5))))
    // the 11:00 tie resolves to the LARGEST carried tuple (103, 3.5)
    assert(out(2L) == ((Some(ts("2024-01-01 11:00:00")), Some(103L), Some(3.5))))
    assert(out(3L) == ((None, None, None))) // no-match: all nulls
  }

  test("asof with tolerance: stale matches nulled, boundary inclusive") {
    val purchases = Seq(
      (1L, 7L, ts("2024-01-01 12:00:00")),  // prior click 59 min old: kept
      (2L, 8L, ts("2024-01-01 12:00:00")),  // prior click 2 h old: nulled
      (3L, 9L, ts("2024-01-01 12:00:00")))  // exactly 60 min: inclusive
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (7L, ts("2024-01-01 11:01:00")),
      (8L, ts("2024-01-01 10:00:00")),
      (9L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "ts")
    val out = Joins.asofBackwardTolerance(purchases, clicks, "user_id",
        "ts", "prior", toleranceMinutes = 60)
      .as[(Long, Long, Timestamp, Option[Timestamp])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L).contains(ts("2024-01-01 11:01:00")))
    assert(out(2L).isEmpty) // a 2h-stale quote must not price the trade
    assert(out(3L).contains(ts("2024-01-01 11:00:00"))) // boundary kept
  }

  test("asof nearest: closer side wins, ties break backward, one-sided falls through") {
    val purchases = Seq(
      (1L, 7L, ts("2024-01-01 12:00:00")), // back 10 min, fwd 5 min: fwd
      (2L, 8L, ts("2024-01-01 12:00:00")), // back 5 min, fwd 5 min: TIE -> back
      (3L, 9L, ts("2024-01-01 12:00:00")), // only a forward click exists
      (4L, 10L, ts("2024-01-01 12:00:00"))) // no clicks at all
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (7L, ts("2024-01-01 11:50:00")), (7L, ts("2024-01-01 12:05:00")),
      (8L, ts("2024-01-01 11:55:00")), (8L, ts("2024-01-01 12:05:00")),
      (9L, ts("2024-01-01 13:00:00")))
      .toDF("user_id", "ts")
    val out = Joins.asofNearest(purchases, clicks, "user_id", "ts", "near")
      .as[(Long, Long, Timestamp, Option[Timestamp])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L).contains(ts("2024-01-01 12:05:00")))
    assert(out(2L).contains(ts("2024-01-01 11:55:00"))) // tie -> backward
    assert(out(3L).contains(ts("2024-01-01 13:00:00")))
    assert(out(4L).isEmpty)
  }

  test("asof forward join picks the smallest right ts >= left ts per key") {
    val purchases = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00")), // after the last click: no next
      (3L, 9L, ts("2024-01-01 09:00:00"))) // user 9 has no clicks
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (7L, ts("2024-01-01 09:30:00")),     // before: never matches forward
      (7L, ts("2024-01-01 10:00:00")),     // tie with purchase 1: inclusive
      (7L, ts("2024-01-01 11:59:00")),
      (8L, ts("2024-01-01 13:00:00")))     // other key
      .toDF("user_id", "ts")
    val out = Joins.asofForward(purchases, clicks, "user_id", "ts", "next")
      .as[(Long, Long, Timestamp, Option[Timestamp])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L).contains(ts("2024-01-01 10:00:00"))) // equal ts wins
    assert(out(2L).isEmpty)                             // nothing later
    assert(out(3L).isEmpty)                             // no clicks at all
    assert(out.size == 3)                               // every left, once
  }

  test("asof join preserves every left row exactly once") {
    val e = Tables.events(spark, sf0001)
    val clicks = e.filter($"event_type" === "click").select("user_id", "ts")
    val purchases = e.filter($"event_type" === "purchase")
      .select("event_id", "user_id", "ts")
    val out = Joins.asofBackward(purchases, clicks, "user_id", "ts", "prior")
    assert(out.count() == purchases.count())
    assert(out.select("event_id").distinct().count() == purchases.count())
  }

  test("bucketed range join equals the naive theta join") {
    val e = Tables.events(spark, sf0001)
    val clicks = e.filter($"event_type" === "click").select("ts")
    val errors = e.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 5 MINUTES")).as("w_end"))
    val bucketed = Joins.rangeJoin(clicks, "ts", errors, "w_start", "w_end", 300000L)
      .groupBy("err_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val naive = clicks.join(errors,
      $"ts" >= $"w_start" && $"ts" < $"w_end")
      .groupBy("err_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }

  test("range join: boundary semantics are [start, end)") {
    val rows = Seq((ts("2024-01-01 10:00:00")), (ts("2024-01-01 10:05:00")))
      .toDF("ts")
    val ivals = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")))
      .toDF("id", "s", "e")
    val out = Joins.rangeJoin(rows, "ts", ivals, "s", "e", 300000L)
    assert(out.count() == 1) // start inclusive, end exclusive
  }

  test("bloom semi join equals the plain semi join exactly") {
    // big side 0..9999; small side: 500 scattered keys — with ~10
    // bits/key the bloom passes false positives, which the survivor
    // join must remove
    val big = spark.range(10000L).select($"id".as("k"), ($"id" * 3).as("v"))
    val small = spark.range(500L).select(($"id" * 17 + 3).as("sk"))
    val pruned = Joins.bloomSemiJoin(big, "k", small, "sk")
      .as[(Long, Long)].collect().toSet
    val plain = big.join(small, $"k" === $"sk", "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(pruned == plain && plain.size == 500)
  }

  test("bloom semi join: null keys never match; empty small side is empty") {
    val big = Seq(Some(1L), Some(2L), None).toDF("k")
    val small = Seq(1L).toDF("sk")
    val out = Joins.bloomSemiJoin(big, "k", small, "sk").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val none = Joins.bloomSemiJoin(big, "k", Seq.empty[Long].toDF("sk"), "sk")
    assert(none.count() == 0)
  }

  test("bloom prefilter sits below the exchange (the shuffle is pruned)") {
    // the whole point of the operator: the codegen'd getbit conjunction
    // must run in the big side's scan stage, BEFORE rows reach any
    // exchange — not after the shuffle it exists to shrink
    val big = spark.range(50000L).select($"id".as("k"))
    val small = spark.range(100L).select(($"id" * 7).as("sk"))
    val plan = Joins.bloomSemiJoin(big, "k", small, "sk")
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val filterIdx = lines.indexWhere(l => l.contains("getbit"))
    assert(filterIdx >= 0, s"no getbit filter in plan:\n$plan")
    // every exchange ABOVE the filter line (smaller index = nearer the
    // root in toString) is allowed; there must be NO exchange printed
    // BELOW the getbit filter on the big-side branch — i.e. the filter
    // consumes the range/scan directly
    val below = lines.drop(filterIdx + 1)
      .takeWhile(l => !l.trim.startsWith("+-") || l.contains("Range"))
    assert(lines(filterIdx + 1).contains("Range") ||
      below.exists(_.contains("Range")),
      s"getbit filter does not sit on the scan:\n$plan")
  }

  test("bloom anti join equals the plain anti join; nulls are kept") {
    val big = spark.range(10000L).select($"id".as("k"), ($"id" * 3).as("v"))
    val small = spark.range(500L).select(($"id" * 17 + 3).as("sk"))
    val pruned = Joins.bloomAntiJoin(big, "k", small, "sk")
      .as[(Long, Long)].collect().toSet
    val plain = big.join(small, $"k" === $"sk", "left_anti")
      .as[(Long, Long)].collect().toSet
    assert(pruned == plain && plain.size == 9500)
    // null big-side keys survive (Spark's left_anti rule), and an empty
    // small side keeps everything
    val withNull = Seq(Some(1L), Some(3L), None).toDF("k")
    val out = Joins.bloomAntiJoin(withNull, "k", Seq(3L).toDF("sk"), "sk")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    assert(out == Set(1L, -1L))
    assert(Joins.bloomAntiJoin(withNull, "k",
      Seq.empty[Long].toDF("sk"), "sk").count() == 3)
  }

  test("interval overlap join equals the naive theta join, half-open edges exact") {
    // touching intervals ([1,5) vs [5,9)) must NOT pair; containment,
    // multi-cell spans, same-cell disjoint, and empty intervals covered
    val l = Seq((1L, 1L, 5L), (2L, 10L, 30L), (3L, 7L, 8L),
      (4L, 100L, 100L), // empty — overlaps nothing
      (5L, 0L, 50L)).toDF("lid", "ls", "le")
    val r = Seq((10L, 5L, 9L), (11L, 12L, 14L), (12L, 29L, 40L),
      (13L, 95L, 105L), (14L, 2L, 3L)).toDF("rid", "rs", "re")
    val naive = l.as("a").join(r.as("b"),
        col("a.ls") < col("b.re") && col("b.rs") < col("a.le") &&
          col("a.ls") < col("a.le") && col("b.rs") < col("b.re"))
      .select(col("a.lid"), col("b.rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    for (bw <- Seq(1L, 7L, 100L)) {
      val got = Joins.intervalOverlapJoin(l, "lid", "ls", "le",
          r, "rid", "rs", "re", bucketWidth = bw)
        .select("lid", "rid")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == naive, s"bucketWidth=$bw: got $got want $naive")
    }
    // intersection bounds are the clipped interval
    val row = Joins.intervalOverlapJoin(l, "lid", "ls", "le",
        r, "rid", "rs", "re", bucketWidth = 7)
      .filter(col("lid") === 2L && col("rid") === 12L)
      .select("overlap_start", "overlap_end")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(row == Seq((29L, 30L)))
    // giant-interval guard: intervals spanning > maxCellsPerInterval
    // cells leave the grid for the broadcast leg, result unchanged
    for (maxCells <- Seq(1, 4)) {
      val guarded = Joins.intervalOverlapJoin(l, "lid", "ls", "le",
          r, "rid", "rs", "re", bucketWidth = 1L,
          maxCellsPerInterval = maxCells)
        .select("lid", "rid")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(guarded == naive, s"maxCells=$maxCells: got $guarded")
    }
  }
}
