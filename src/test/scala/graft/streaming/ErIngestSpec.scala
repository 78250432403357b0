package graft.streaming

import graft.SparkSpec
import graft.ops.EntityResolution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for streaming entity resolution: after any
  * sequence of micro-batches, the accumulated pair set must equal the
  * batch edit-distance self-join over everything ingested — and replays
  * must not move it.
  */
class ErIngestSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Long, n: Int, idBase: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = 3 + rnd.nextInt(5)
      (idBase + i,
        (0 until len).map(_ => "abc"(rnd.nextInt(3))).mkString)
    }
  }

  test("accumulated pairs equal the batch self-join; replay is idempotent") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_er_").toString
    val (indexDir, pairsDir) = (s"$tmp/index", s"$tmp/pairs")
    val batches = Seq(corpus(1, 40, 0), corpus(2, 40, 1000),
      corpus(3, 40, 2000))

    val input = MemoryStream[(Long, String)]
    val q = ErIngest.start(input.toDF().toDF("id", "s"),
      indexDir, pairsDir, s"$tmp/ckpt", "id", "s", d = 1)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val all = batches.flatten.toDF("id", "s")
    val want = EntityResolution.editDistanceSelfJoin(all, "id", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def got() = ErIngest.pairs(spark, pairsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got() == want, s"stream=${got().size} batch=${want.size}")
    assert(want.nonEmpty, "fixture produced no pairs — test is vacuous")
    // cross-batch pairs must exist, or the index join went untested
    val crossBatch = want.count { case (a, b, _) => (a / 1000) != (b / 1000) }
    assert(crossBatch > 0, "no cross-batch pairs — fixture too sparse")

    // at-least-once replay: re-ingest batch 2 wholesale (its segment
    // rows AND pairs append again) — the normalized report must not move
    ErIngest.ingestBatch(batches(1).toDF("id", "s"),
      indexDir, pairsDir, "id", "s", d = 1)
    assert(got() == want, "replayed batch moved the pair report")
    // compact: replay-dedup fixpoint of segment index + pairs
    val rawIdx = spark.read.parquet(indexDir).count()
    ErIngest.compact(spark, indexDir, pairsDir)
    assert(spark.read.parquet(indexDir).count() < rawIdx,
      "replayed segment rows should collapse")
    assert(got() == want, "compact moved the pair report")
  }
}
