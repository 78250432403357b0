package graft.streaming

import graft.SparkSpec
import graft.ops.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for the gap-constrained sequential-pattern
  * ingest: after any sequence of time-ordered micro-batches the
  * accumulated user-level support sets (length 2 and 3) must equal the
  * batch operators over everything ingested; replays must not move
  * them; purge forgets a user everywhere.
  */
class SeqPatternIngestSpec extends SparkSpec {
  import spark.implicits._

  test("accumulated gap support equals the batch scan; replay idempotent; purge forgets") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_sqp_").toString
    val dirs = (s"$tmp/last", s"$tmp/v2", s"$tmp/s2", s"$tmp/s3")
    val (lastDir, v2Dir, s2Dir, s3Dir) = dirs
    val g = 100L
    // (user, type, tsec, event_id) — time-ordered per user across
    // batches; patterns planted within, across two, and across THREE
    // batches (the valid2 summary is what carries the third)
    val b1 = Seq((1L, "A", 0L, 1L), (1L, "B", 50L, 2L),
      (2L, "A", 0L, 10L), (2L, "B", 200L, 11L), // gap 200 > g: no pair
      (3L, "A", 0L, 20L),                       // lone event
      (4L, "A", 0L, 30L))
    val b2 = Seq((1L, "C", 120L, 3L),           // (B,C) 70; (A,B,C) 50+70
      (2L, "A", 300L, 12L),
      (4L, "B", 80L, 31L))                      // valid2 (A,B) at 80
    val b3 = Seq((2L, "B", 350L, 13L),          // cross-batch (A,B) 50
      (4L, "C", 150L, 32L))                     // triple across 3 batches
    val batches = Seq(b1, b2, b3)

    val input = MemoryStream[(Long, String, Long, Long)]
    val q = SeqPatternIngest.start(
      input.toDF().toDF("user_id", "event_type", "tsec", "event_id"),
      lastDir, v2Dir, s2Dir, s3Dir, s"$tmp/ckpt", g)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val all = batches.flatten
      .toDF("user_id", "event_type", "tsec", "event_id")
    def agg2(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("type_a", "type_b").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    def agg3(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("type_a", "type_b", "type_c").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val want2 = EventOps.seqPatternsGap(all, g)
      .select($"type_a", $"type_b", $"n_users".as("count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val want3 = EventOps.seqPatternsGap3(all, g)
      .select($"type_a", $"type_b", $"type_c", $"n_users".as("count"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(want2.nonEmpty && want3.nonEmpty, "vacuous fixture")
    // the cross-batch pair and the three-batch triple must be in play
    assert(want2.contains(("A", "B", 3L)),
      s"expected users 1,2,4 to support (A,B): $want2")
    assert(want3.contains(("A", "B", "C", 2L)),
      s"expected users 1,4 to support (A,B,C): $want3")
    def got2() = agg2(SeqPatternIngest.support2(spark, s2Dir))
    def got3() = agg3(SeqPatternIngest.support3(spark, s3Dir))
    assert(got2() == want2, s"pairs: got ${got2()} want $want2")
    assert(got3() == want3, s"triples: got ${got3()} want $want3")

    // at-least-once replay of the middle batch: a replayed event never
    // sees its own summary marker (tie on (tsec, event_id) orders the
    // query first), so nothing can be fabricated — sets must not move
    SeqPatternIngest.ingestBatch(
      b2.toDF("user_id", "event_type", "tsec", "event_id"),
      lastDir, v2Dir, s2Dir, s3Dir, g)
    assert(got2() == want2, "replay moved the pair support set")
    assert(got3() == want3, "replay moved the triple support set")
    // replaying the LONE user's batch must not mint a self-pair
    SeqPatternIngest.ingestBatch(
      Seq((3L, "A", 0L, 20L)).toDF("user_id", "event_type", "tsec",
        "event_id"),
      lastDir, v2Dir, s2Dir, s3Dir, g)
    assert(got2() == want2, "lone-event replay fabricated support")

    // purge user 1 everywhere
    val removed = SeqPatternIngest.purge(spark, Seq(1L).toDF("user_id"),
      lastDir, v2Dir, s2Dir, s3Dir)
    assert(removed.values.sum > 0, s"purge removed nothing: $removed")
    assert(SeqPatternIngest.support2(spark, s2Dir)
      .filter($"user_id" === 1L).count() == 0)
    assert(SeqPatternIngest.support3(spark, s3Dir)
      .filter($"user_id" === 1L).count() == 0)
    assert(spark.read.parquet(lastDir)
      .filter($"user_id" === 1L).count() == 0)
  }

  test("compaction is invisible to reads and the recurrence converges after it") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sqpc_").toString
    val (lastDir, v2Dir, s2Dir, s3Dir) =
      (s"$tmp/last", s"$tmp/v2", s"$tmp/s2", s"$tmp/s3")
    val g = 100L
    def ingest(rows: Seq[(Long, String, Long, Long)]): Unit =
      SeqPatternIngest.ingestBatch(
        rows.toDF("user_id", "event_type", "tsec", "event_id"),
        lastDir, v2Dir, s2Dir, s3Dir, g)
    // several batches touching the SAME keys so the append-grown stores
    // hold multiple partials per key (the O(batches x keys) growth
    // compact exists to cut)
    ingest(Seq((1L, "A", 0L, 1L), (2L, "A", 0L, 10L)))
    ingest(Seq((1L, "A", 30L, 2L), (2L, "B", 60L, 11L)))
    ingest(Seq((1L, "B", 70L, 3L), (2L, "A", 120L, 12L)))
    def snap2() = SeqPatternIngest.support2(spark, s2Dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    def stored(d: String) = spark.read.parquet(d).collect()
      .map(_.toSeq).toSet
    val (before2, beforeLast, beforeV2) =
      (snap2(), stored(lastDir), stored(v2Dir))
    val rawLast = spark.read.parquet(lastDir).count()
    assert(rawLast > spark.read.parquet(lastDir)
      .dropDuplicates("user_id", "type_a").count(),
      "fixture holds no per-key partials — compaction untested")

    SeqPatternIngest.compact(spark, lastDir, v2Dir, s2Dir, s3Dir,
      numFiles = 1)
    // size: one row per key now
    assert(spark.read.parquet(lastDir).count() ==
      spark.read.parquet(lastDir).dropDuplicates("user_id", "type_a")
        .count())
    // invisible: support sets and the read-side maxima are unchanged
    assert(snap2() == before2, "compaction moved the support set")
    assert(stored(v2Dir).subsetOf(beforeV2),
      "compaction invented valid2 state")
    assert(beforeLast.map(r => (r.head, r(1))) ==
      stored(lastDir).map(r => (r.head, r(1))),
      "compaction dropped a (user, type) key")

    // convergence: ingesting AFTER compaction still matches the batch
    // operator over everything ever ingested
    ingest(Seq((1L, "C", 130L, 4L), (2L, "B", 150L, 13L)))
    val all = Seq((1L, "A", 0L, 1L), (2L, "A", 0L, 10L),
      (1L, "A", 30L, 2L), (2L, "B", 60L, 11L),
      (1L, "B", 70L, 3L), (2L, "A", 120L, 12L),
      (1L, "C", 130L, 4L), (2L, "B", 150L, 13L))
      .toDF("user_id", "event_type", "tsec", "event_id")
    val want = EventOps.seqPatternsGap(all, g)
      .select($"type_a", $"type_b", $"n_users")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val got = SeqPatternIngest.support2(spark, s2Dir)
      .groupBy("type_a", "type_b").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == want, s"post-compaction ingest diverged: $got vs $want")
  }

  test("orderViolations flags out-of-order batches against the stored frontier") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sqpo_").toString
    val (lastDir, v2Dir, s2Dir, s3Dir) =
      (s"$tmp/last", s"$tmp/v2", s"$tmp/s2", s"$tmp/s3")
    val b1 = Seq((1L, "A", 100L, 1L), (2L, "A", 500L, 10L))
    SeqPatternIngest.ingestBatch(
      b1.toDF("user_id", "event_type", "tsec", "event_id"),
      lastDir, v2Dir, s2Dir, s3Dir, 100L)
    // strictly-later batch: clean
    assert(SeqPatternIngest.orderViolations(
      Seq((1L, "B", 101L, 2L), (2L, "B", 501L, 11L))
        .toDF("user_id", "event_type", "tsec", "event_id"),
      lastDir).count() == 0)
    // out-of-order for user 2 only (tsec before the frontier), plus a
    // same-tsec earlier-event_id tie for user 1 — both flagged, the
    // clean later row is not
    val bad = Seq((1L, "B", 100L, 0L), (2L, "B", 400L, 11L),
      (2L, "C", 600L, 12L))
      .toDF("user_id", "event_type", "tsec", "event_id")
    val v = SeqPatternIngest.orderViolations(bad, lastDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v == Set((1L, "B"), (2L, "B")), s"got $v")
    // at-least-once replay trips the audit conservatively (equality
    // with the frontier), as documented
    assert(SeqPatternIngest.orderViolations(
      b1.toDF("user_id", "event_type", "tsec", "event_id"),
      lastDir).count() == b1.size)
    // a fresh (never-stored) store flags nothing
    assert(SeqPatternIngest.orderViolations(
      bad, s"$tmp/nosuch").count() == 0)
  }
}
