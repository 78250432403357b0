package graft.streaming

import graft.SparkSpec
import graft.ops.Dimensions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

class Scd2IngestSpec extends SparkSpec {
  import spark.implicits._

  test("CDC stream maintains the SCD2 history; replayed batches are no-ops") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_scd2_").toString
    val dir = s"$tmp/history"
    val input = MemoryStream[(Long, String, Long)]
    val q = Scd2Ingest.start(
      input.toDF().toDF("id", "tier", "ts"), dir, s"$tmp/ckpt",
      keyCols = Seq("id"), tsCol = "ts")
    try {
      // batch 1 bootstraps (with an in-batch flicker to collapse)
      input.addData((1L, "flicker", 5L), (1L, "gold", 10L),
        (2L, "silver", 10L))
      q.processAllAvailable()
      // batch 2 changes id 1
      input.addData((1L, "platinum", 100L))
      q.processAllAvailable()
    } finally q.stop()
    def hist() = Scd2Ingest.history(spark, dir)
      .select("id", "tier", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    val want = Set(
      (1L, "gold", 10L, Some(100L)),
      (1L, "platinum", 100L, None),
      (2L, "silver", 10L, None))
    assert(hist() == want)
    // the streamed history serves the batch query surfaces
    assert(Dimensions.snapshotAt(Scd2Ingest.history(spark, dir),
        org.apache.spark.sql.functions.lit(50L))
      .as[(Long, String)].collect().toSet ==
      Set((1L, "gold"), (2L, "silver")))

    // at-least-once replay: re-deliver batch 2 — without the guard this
    // closes platinum at its own valid_from and inserts a duplicate
    Scd2Ingest.ingestBatch(Seq((1L, "platinum", 100L)).toDF("id", "tier", "ts"),
      dir, Seq("id"), "ts")
    assert(hist() == want, "replayed change batch moved the history")
    // exactly one open row per key survives everything
    val opens = Scd2Ingest.history(spark, dir)
      .filter(col("valid_to").isNull).groupBy(col("id")).count()
      .as[(Long, Long)].collect().toMap
    assert(opens == Map(1L -> 1L, 2L -> 1L))
  }
}
