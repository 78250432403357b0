package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for streaming near-dup ingestion: feeding the
  * fixture corpus through [[NearDupIngest]] in several micro-batches must
  * produce exactly the candidate set the batch LSH self-join finds on the
  * whole corpus — within-batch pairs from the intra join, cross-batch
  * pairs from the batch-vs-index join, no pair lost or invented.
  */
class NearDupIngestSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched ingestion equals batch LSH candidates on the corpus") {
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(docs.size > 10)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndi_").toString
    val (indexDir, pairsDir, ckpt) =
      (s"$tmp/index", s"$tmp/pairs", s"$tmp/ckpt")

    val input = MemoryStream[(Long, String)]
    val q = NearDupIngest.start(
      input.toDF().toDF("doc_id", "text"), indexDir, pairsDir, ckpt,
      numHashes = 16, bands = 4)
    try {
      // three uneven micro-batches covering the whole corpus
      docs.grouped(math.max(docs.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(pairsDir).distinct()
      .collect().map(_.toSeq).toSet
    val batch = Dedup.lshCandidatePairs(
      docs.toDF("doc_id", "text"), "doc_id", numHashes = 16, bands = 4)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty) // the fixture plants near-dup pairs
    // the persistent index holds every document's band rows exactly once
    val idx = spark.read.parquet(indexDir)
    assert(idx.count() == docs.size.toLong * 4)
    spark.catalog.clearCache()
  }

  test("index compaction preserves content, reduces files, ingest continues") {
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndi_c_").toString
    val (indexDir, pairsDir, ckpt) = (s"$tmp/index", s"$tmp/pairs", s"$tmp/ckpt")
    // ingest most of the corpus in three batches, hold back the tail
    val (head, tail) = docs.splitAt(docs.size * 3 / 4)
    val input = MemoryStream[(Long, String)]
    val q = NearDupIngest.start(input.toDF().toDF("doc_id", "text"),
      indexDir, pairsDir, ckpt)
    try {
      head.grouped(math.max(head.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      q.stop()
      val preCompact = spark.read.parquet(indexDir)
        .collect().map(_.toSeq).toSet
      val (before, after) = NearDupIngest.compactTable(spark, indexDir, 2)
      assert(before > 2 && after <= 2, s"files $before -> $after")
      val postCompact = spark.read.parquet(indexDir)
        .collect().map(_.toSeq).toSet
      assert(postCompact == preCompact)
      // ingest the held-back tail against the compacted index: the
      // accumulated candidate set must still equal the batch self-join
      NearDupIngest.ingestBatch(tail.toDF("doc_id", "text"),
        indexDir, pairsDir, "doc_id", 16, 4, "text", 3)
      val streamed = spark.read.parquet(pairsDir).distinct()
        .collect().map(_.toSeq).toSet
      val batch = Dedup.lshCandidatePairs(docs.toDF("doc_id", "text"),
        "doc_id", numHashes = 16, bands = 4)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally if (q.isActive) q.stop()
    spark.catalog.clearCache()
  }

  test("verified ingestion equals the batch two-phase fuzzy pipeline") {
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndi_v_").toString
    val input = MemoryStream[(Long, String)]
    val q = NearDupIngest.startVerified(
      input.toDF().toDF("doc_id", "text"),
      s"$tmp/index", s"$tmp/docs", s"$tmp/verified", s"$tmp/ckpt",
      threshold = 0.5)
    try {
      docs.grouped(math.max(docs.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$tmp/verified").distinct()
      .collect().map(_.toSeq).toSet
    val batch = Dedup.fuzzy(docs.toDF("doc_id", "text"), "doc_id",
      numHashes = 16, bands = 4, threshold = 0.5)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty) // planted near-dup pairs survive verification
    spark.catalog.clearCache()
  }

  test("simhash ingestion equals batch hamming pairs on the corpus") {
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndi_sh_").toString
    val input = MemoryStream[(Long, String)]
    val q = NearDupIngest.startSimhash(
      input.toDF().toDF("doc_id", "text"),
      s"$tmp/index", s"$tmp/pairs", s"$tmp/ckpt", maxHamming = 3)
    try {
      docs.grouped(math.max(docs.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$tmp/pairs").distinct()
      .collect().map(_.toSeq).toSet
    val batch = Dedup.simhashPairs(
      Dedup.simhash(docs.toDF("doc_id", "text"), "doc_id", "text"),
      maxHamming = 3).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    spark.catalog.clearCache()
  }

  test("embedding ingestion equals batch SRP near-dup pairs on the corpus") {
    implicit val ctx = spark.sqlContext
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndi_emb_").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = NearDupIngest.startEmbedding(
      input.toDF().toDF("vec_id", "embedding"),
      s"$tmp/index", s"$tmp/pairs", s"$tmp/ckpt",
      planes = 4, dim = 64, threshold = 0.2)
    try {
      vecs.grouped(math.max(vecs.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$tmp/pairs").distinct()
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Similarity.srpNearDupPairs(
      vecs.toDF("vec_id", "embedding"), planes = 4, dim = 64,
      threshold = 0.2).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    spark.catalog.clearCache()
  }

  test("semantic ingestion equals batch cell-blocked pairs (frozen codebook)") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val all = vecs.toDF("vec_id", "embedding")
    // the frozen quantizer: trained once on the full fixture corpus —
    // every micro-batch and the batch reference assign under the SAME
    // cells, which is the invariant the parity assertion exercises
    val cb = graft.ops.Similarity.kmeansTrain(all,
      all.filter(col("vec_id") % 50 === 0), maxIters = 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndi_sem_").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = NearDupIngest.startSemantic(
      input.toDF().toDF("vec_id", "embedding"),
      s"$tmp/index", s"$tmp/pairs", s"$tmp/ckpt", cb, threshold = 0.2)
    try {
      vecs.grouped(math.max(vecs.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$tmp/pairs").distinct()
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Similarity.semanticDedupPairsWith(all, cb,
      threshold = 0.2).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    spark.catalog.clearCache()
  }

  test("purge forgets a document: index, pairs, and future ingestion") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndi_p_").toString
    val (indexDir, pairsDir) = (s"$tmp/index", s"$tmp/pairs")
    // two near-identical docs plus an unrelated one, ingested as a batch
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, t1), (2L, t1 + " extra"),
      (3L, "completely unrelated content about spark physical plans"))
    NearDupIngest.ingestBatch(docs.toDF("doc_id", "text"), indexDir,
      pairsDir, "doc_id", 16, 4, "text", 3)
    val pairs0 = spark.read.parquet(pairsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs0.contains((1L, 2L)))
    // purge doc 1: nothing in any store may reference it
    val removed = NearDupIngest.purge(spark, Seq(1L).toDF("id"),
      indexDirs = Seq(indexDir), pairsDirs = Seq(pairsDir))
    assert(removed(indexDir) == 4L) // its 4 band rows
    assert(removed(pairsDir) >= 1L)
    assert(spark.read.parquet(indexDir)
      .filter(col("doc_id") === 1L).count() == 0)
    assert(spark.read.parquet(pairsDir)
      .filter(col("doc_a") === 1L || col("doc_b") === 1L).count() == 0)
    // doc 3 and the 2<->? relationships of OTHER docs are untouched
    assert(spark.read.parquet(indexDir)
      .select("doc_id").distinct().count() == 2)
    // a re-ingested copy of the purged text is treated as NEVER SEEN:
    // it pairs with the surviving near-dup 2, and with nothing else
    NearDupIngest.ingestBatch(Seq((9L, t1)).toDF("doc_id", "text"),
      indexDir, pairsDir, "doc_id", 16, 4, "text", 3)
    val pairsAfter = spark.read.parquet(pairsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsAfter.contains((2L, 9L)))
    assert(!pairsAfter.exists(p => p._1 == 1L || p._2 == 1L))
    // purging an id that is absent is a no-op, not an error
    val again = NearDupIngest.purge(spark, Seq(1L).toDF("id"),
      indexDirs = Seq(indexDir), pairsDirs = Seq(pairsDir))
    assert(again.values.forall(_ == 0L))
  }
}
