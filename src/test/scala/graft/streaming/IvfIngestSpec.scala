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

  test("retrain closes the drift loop: audit-gated, balance improves, serve stays batch-parity") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfr_").toString
    val (cbDir, idxDir) = (s"$tmp/codebook", s"$tmp/index")
    // three tight in-distribution clusters (what the quantizer was
    // trained for) + a drifted cluster the frozen codebook never saw
    def jit(i: Int) = 0.01f * (i % 5)
    val a1 = (0L until 10L).map(i => (i, Seq(1f, 0f, 0.2f + jit(i.toInt), 0f)))
    val a2 = (10L until 20L).map(i => (i, Seq(0.2f, 0f, 1f, jit(i.toInt))))
    val a3 = (20L until 30L).map(i => (i, Seq(0f, jit(i.toInt), 0f, 1f)))
    // two distinguishable drifted sub-clusters that the frozen codebook
    // cannot separate (both land in one hot cell) but a reseeded Lloyd
    // can — the split is what the balance improvement below measures
    val drift = (100L until 130L).map(i => (i, Seq(jit(i.toInt), 1f, 0f, 0f))) ++
      (130L until 160L).map(i => (i, Seq(0f, 1f, 0.5f + jit(i.toInt), 0f)))
    val inDist = a1 ++ a2 ++ a3

    val cb0 = Similarity.kmeansTrain(inDist.toDF("vec_id", "embedding"),
      Seq(a1.head, a2.head, a3.head).toDF("vec_id", "embedding"),
      maxIters = 3)
    IvfIngest.freezeCodebook(cb0, cbDir)
    IvfIngest.ingestBatch(inDist.toDF("vec_id", "embedding"), cbDir, idxDir)

    // below the gate: nothing fires, neither store moves
    val cbBefore = spark.read.parquet(cbDir).collect().map(_.toSeq).toSet
    assert(!IvfIngest.retrain(spark, cbDir, idxDir, maxIters = 3,
      minSkew = 1e9))
    assert(spark.read.parquet(cbDir).collect().map(_.toSeq).toSet
      == cbBefore, "gated-off retrain must not touch the codebook")

    // drifted data piles into one frozen cell -> skew fires the gate
    IvfIngest.ingestBatch(drift.toDF("vec_id", "embedding"), cbDir, idxDir)
    val skewBefore = IvfIngest.balanceAudit(spark, idxDir)
      .agg(max($"skew_ratio")).head().getDouble(0)
    assert(skewBefore > 1.3, s"fixture should drift (skew $skewBefore)")
    assert(IvfIngest.retrain(spark, cbDir, idxDir, maxIters = 5,
      minSkew = 1.3))

    val skewAfter = IvfIngest.balanceAudit(spark, idxDir)
      .agg(max($"skew_ratio")).head().getDouble(0)
    assert(skewAfter < skewBefore,
      s"retrain must improve balance ($skewBefore -> $skewAfter)")
    // the retrained index still holds every vector exactly once
    assert(IvfIngest.index(spark, idxDir).count() ==
      (inDist.size + drift.size))

    // serving from the retrained stores == batch ivfTopKWith under the
    // NEW codebook over the same corpus
    val all = (inDist ++ drift).toDF("vec_id", "embedding")
    val queries = all.filter($"vec_id" % 7 === 0)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"vec_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = key(Similarity.ivfTopKWith(all,
      spark.read.parquet(cbDir), $"vec_id" % 7 === 0, nprobe = 2, k = 3))
    val got = key(IvfIngest.serve(spark, cbDir, idxDir, queries,
      nprobe = 2, k = 3))
    assert(want.nonEmpty && got == want,
      s"missing ${want -- got}, extra ${got -- want}")

    // zero-ROW store (empty micro-batches wrote empty files): retrain
    // must gate off rather than freeze an empty codebook over the
    // real one
    val emptyIdx = s"$tmp/empty_index"
    graft.ops.Similarity.ivfAssign(inDist.toDF("vec_id", "embedding")
      .limit(0), spark.read.parquet(cbDir))
      .write.parquet(emptyIdx)
    val cbNow = spark.read.parquet(cbDir).collect().map(_.toSeq).toSet
    assert(!IvfIngest.retrain(spark, cbDir, emptyIdx, maxIters = 2))
    assert(spark.read.parquet(cbDir).collect().map(_.toSeq).toSet
      == cbNow, "empty-store retrain must not touch the codebook")
  }
}
