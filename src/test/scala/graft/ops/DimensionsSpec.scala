package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimensionsSpec extends SparkSpec {
  import spark.implicits._

  test("scd2: changes close current rows, snapshots time-travel, flickers collapse") {
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("id", "tier")
    val h0 = Dimensions.scd2Init(dim, lit(0L))
    // batch 1: id 1 -> platinum at t=100, with an in-batch flicker at
    // t=50 that latest-wins must discard; id 3 is a brand-new key
    val ch1 = Seq((1L, "flicker", 50L), (1L, "platinum", 100L),
      (3L, "bronze", 100L)).toDF("id", "tier", "ts")
    val h1 = Dimensions.scd2Apply(h0, ch1, Seq("id"), "ts")
    val rows = h1.select("id", "tier", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(rows == Set(
      (1L, "gold", 0L, Some(100L)),       // closed at the LATEST change
      (1L, "platinum", 100L, None),
      (2L, "silver", 0L, None),           // untouched
      (3L, "bronze", 100L, None)))        // new key inserts open

    // time travel: before and after the change
    assert(Dimensions.snapshotAt(h1, lit(99L))
      .as[(Long, String)].collect().toSet ==
      Set((1L, "gold"), (2L, "silver")))
    assert(Dimensions.snapshotAt(h1, lit(100L))
      .as[(Long, String)].collect().toSet ==
      Set((1L, "platinum"), (2L, "silver"), (3L, "bronze")))

    // a RETURNING key: id 1 deleted upstream then re-appears — its
    // closed history survives and a new open row starts
    val h2 = Dimensions.scd2Apply(h1,
      Seq((1L, "gold", 200L)).toDF("id", "tier", "ts"), Seq("id"), "ts")
    val id1 = h2.filter(col("id") === 1L)
      .select("tier", "valid_from", "valid_to")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(id1 == Set(("gold", 0L, Some(100L)),
      ("platinum", 100L, Some(200L)), ("gold", 200L, None)))
    // exactly one open row per key, always
    val opens = h2.filter(col("valid_to").isNull)
      .groupBy(col("id")).count().as[(Long, Long)].collect().toMap
    assert(opens.values.forall(_ == 1L))
  }

  test("temporalJoin: version valid at fact time, expiry guard, unknown keys null") {
    val history = Seq(
      (1L, "gold", 0L, Some(100L)),
      (1L, "platinum", 100L, None),
      (2L, "silver", 0L, Some(50L))) // closed, NO successor (deleted key)
      .toDF("id", "tier", "valid_from", "valid_to")
    val facts = Seq(
      (10L, 1L, 99L),   // before the change: gold
      (11L, 1L, 100L),  // at the change boundary: platinum (from <= ts)
      (12L, 2L, 40L),   // inside the closed version: silver
      (13L, 2L, 60L),   // AFTER deletion: expiry guard -> null
      (14L, 9L, 10L))   // unknown key -> null
      .toDF("event_id", "id", "tsec")
    val out = Dimensions.temporalJoin(facts, history, "id", "tsec",
        Seq("tier"))
      .select("event_id", "dim_tier")
      .as[(Long, Option[String])].collect().toMap
    assert(out == Map(10L -> Some("gold"), 11L -> Some("platinum"),
      12L -> Some("silver"), 13L -> None, 14L -> None))
  }
}
