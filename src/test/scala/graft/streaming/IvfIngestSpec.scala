package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-vs-batch parity for the IVF index ingest: after any sequence
  * of micro-batches, serving from the accumulated index must equal the
  * batch ivfAssign + ivfTopKIndexed over everything ingested against
  * the same frozen codebook; replays must not move results; purge
  * forgets a vector and re-ingest restores it.
  */
class IvfIngestSpec extends SparkSpec {
  import spark.implicits._

  test("served top-k equals the batch index; replay idempotent; purge + re-ingest") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    val (cbDir, idxDir) = (s"$tmp/codebook", s"$tmp/index")
    val all = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // frozen quantizer: one Lloyd pass from the deterministic seed —
    // trained ONCE, before any ingest (the deployment posture)
    val cb = Similarity.kmeansTrain(all,
      all.filter($"vec_id" % 50 === 0), maxIters = 1)
    IvfIngest.freezeCodebook(cb, cbDir)

    val rows = all.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    val input = MemoryStream[(Long, Seq[Float])]
    val q = IvfIngest.start(
      input.toDF().toDF("vec_id", "embedding"), cbDir, idxDir,
      s"$tmp/ckpt")
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val queries = all.filter($"vec_id" % 97 === 0)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"vec_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = key(Similarity.ivfTopKIndexed(
      Similarity.ivfAssign(all, spark.read.parquet(cbDir)),
      spark.read.parquet(cbDir), queries, nprobe = 3, k = 5))
    def got() = key(IvfIngest.serve(spark, cbDir, idxDir, queries,
      nprobe = 3, k = 5))
    assert(want.nonEmpty, "vacuous fixture")
    assert(got() == want, s"missing ${want -- got()}, extra ${got() -- want}")

    // the accumulated index row set equals the batch assignment
    assert(IvfIngest.index(spark, idxDir).count() == all.count())
    // balance audit: every vector accounted for, sane skew
    val audit = IvfIngest.balanceAudit(spark, idxDir)
    assert(audit.agg(sum($"n_vectors")).head.getLong(0) == all.count())
    assert(audit.select(max($"skew_ratio")).head.getDouble(0) >= 1.0)

    // at-least-once replay: assignment is deterministic, index dedups
    IvfIngest.ingestBatch(batches(1).toSeq.toDF("vec_id", "embedding"),
      cbDir, idxDir)
    assert(got() == want, "replayed batch moved the served top-k")

    // purge one vector that appears in the results, then re-ingest it
    val victim = want.map(_._2).head
    assert(IvfIngest.purge(spark, Seq(victim).toDF("vec_id"), idxDir) > 0)
    assert(!got().exists(_._2 == victim), "purged vector still served")
    IvfIngest.ingestBatch(
      rows.filter(_._1 == victim).toSeq.toDF("vec_id", "embedding"),
      cbDir, idxDir)
    assert(got() == want, "re-ingest after purge did not restore parity")

    // compact (family-wide store-hygiene face): collapses the replayed
    // duplicates to the read-side fixpoint, invisible to reads, and
    // further ingest converges identically afterwards
    val rawBefore = spark.read.parquet(idxDir).count()
    assert(rawBefore > all.count(), "replay should have left duplicates")
    IvfIngest.compact(spark, idxDir)
    assert(spark.read.parquet(idxDir).count() == all.count(),
      "compact must rewrite to one row per vec_id")
    assert(got() == want, "compact changed the served top-k")
    IvfIngest.ingestBatch(batches(0).toSeq.toDF("vec_id", "embedding"),
      cbDir, idxDir)
    assert(got() == want, "post-compact replay ingest moved results")
  }
}
