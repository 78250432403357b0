package graft.streaming

import graft.SparkSpec
import graft.ops.Aggregations
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for the frontier-state skyline ingest: after
  * any sequence of micro-batches the persisted frontier must equal the
  * batch skyline over everything ingested — including batches whose
  * points DOMINATE earlier frontier members (the frontier must shrink),
  * ties that must co-survive, and a replayed batch (idempotent).
  */
class SkylineIngestSpec extends SparkSpec {
  import spark.implicits._

  test("frontier equals the batch skyline; dominating arrivals shrink it; replay idempotent") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_sky_").toString
    val frontierDir = s"$tmp/frontier"
    val batches = Seq(
      Seq((1L, 5, 5.0), (2L, 3, 8.0), (3L, 8, 2.0)),
      // 4 dominates 1 (both dims strictly); 5 ties 2 on (x, y) — both live
      Seq((4L, 4, 4.0), (5L, 3, 8.0)),
      // 6 dominates EVERYTHING so far; 7 arrives already dominated
      Seq((6L, 1, 1.0), (7L, 9, 9.0)))

    val input = MemoryStream[(Long, Int, Double)]
    val q = SkylineIngest.start(input.toDF().toDF("id", "x", "y"),
      frontierDir, s"$tmp/ckpt", "id", "x", "y")
    def got() = SkylineIngest.frontier(spark, frontierDir)
      .select("id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    def want(upTo: Int) = Aggregations.skyline2D(
        batches.take(upTo).flatten.toDF("id", "x", "y"), "x", "y")
      .select("id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b: _*); q.processAllAvailable()
        assert(got() == want(i + 1), s"after batch ${i + 1}")
      }
    } finally q.stop()
    // non-vacuous shape checks: ties co-survived mid-stream, and the
    // final frontier collapsed to the single dominator
    assert(want(2).map(_._1) == Set(2L, 3L, 4L, 5L))
    assert(got() == Set((6L, 1, 1.0)))
    // at-least-once replay of the middle batch: frontier must not move
    SkylineIngest.ingestBatch(batches(1).toDF("id", "x", "y"),
      frontierDir, "id", "x", "y")
    assert(got() == Set((6L, 1, 1.0)), "replayed batch moved the frontier")
  }
}
