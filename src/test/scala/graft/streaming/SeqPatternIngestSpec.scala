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
}
