package graft.streaming

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-vs-batch parity for streaming exact-substring dedup: feeding
  * the corpus through in id-ordered micro-batches must keep EXACTLY the
  * docs the batch operator keeps — including cross-batch overlaps (the
  * planted copy arrives two batches after its source) — and the index
  * must hold every ingested doc's windows (kept and dropped).
  */
class SubstrDedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  // 9 docs in 3 id-ordered batches; overlaps WITHIN batch 1 (doc 3
  // copies doc 1), ACROSS batches (doc 102 copies doc 1; doc 202 copies
  // doc 101), and a chain case (doc 203 copies doc 3, which was itself
  // dropped — batch semantics still drop 203: the index holds dropped
  // docs' windows)
  private val shared = toks("a", 25)
  private val b1 = Seq(
    (1L, shared + " " + toks("x", 10)),
    (2L, toks("y", 30)),
    (3L, shared + " " + toks("z", 10)))
  private val b2 = Seq(
    (101L, toks("q", 28)),
    (102L, shared + " " + toks("w", 10)))
  private val b3 = Seq(
    (201L, toks("r", 25)),
    (202L, toks("q", 28) + " tailmark202"),
    (203L, shared + " " + toks("z", 10) + " tail203"))

  test("id-ordered micro-batches equal the batch operator exactly") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_sd_").toString
    val (idxDir, cleanDir, ckpt) = (s"$tmp/idx", s"$tmp/clean", s"$tmp/ckpt")
    val input = MemoryStream[(Long, String)]
    val q = SubstrDedupIngest.start(input.toDF().toDF("doc_id", "text"),
      idxDir, cleanDir, ckpt, w = 20)
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val corpus = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val streamed = spark.read.parquet(cleanDir).distinct()
      .collect().map(_.toSeq).toSet
    val batch = TextAnalysis.substringDedup(corpus, "doc_id", "text", w = 20)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    val keptIds = streamed.map(_.head.asInstanceOf[Long])
    // 3 dropped in-batch, 102 cross-batch, 202 cross-batch (prefix run
    // of 101), 203 via the DROPPED doc 3's windows
    assert(keptIds == Set(1L, 2L, 101L, 201L))

    // the index holds every ingested doc's windows: rebuilding the flag
    // decision for a NEW copy of doc 3's text must drop it
    val probe = Seq((999L, shared + " " + toks("z", 10) + " probetail"))
      .toDF("doc_id", "text")
    val kept = TextAnalysis.substringDedupIndexed(probe,
      SubstrDedupIngest.readIndex(spark, idxDir), "doc_id", "text", w = 20)
    assert(kept.count() == 0)

    // compaction preserves the per-key min-owner relation
    val before = SubstrDedupIngest.readIndexOwners(spark, idxDir)
      .collect().map(_.toSeq).toSet
    SubstrDedupIngest.compactIndex(spark, idxDir, numFiles = 1)
    assert(spark.read.parquet(idxDir).collect().map(_.toSeq).toSet == before)
  }

  test("shuffled-order ingestion: republish converges to exact batch parity") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_sd3_").toString
    val (idxDir, cleanDir, ckpt) = (s"$tmp/idx", s"$tmp/clean", s"$tmp/ckpt")
    // the SAME 9 docs, delivered out of id order: the chain-copy 203
    // and its transitive source's copy 3 arrive BEFORE the true keeper
    // 1 — the worst case for first-ingested-wins semantics
    val bX = Seq((203L, shared + " " + toks("z", 10) + " tail203"),
      (101L, toks("q", 28)))
    val bY = Seq((3L, shared + " " + toks("z", 10)),
      (202L, toks("q", 28) + " tailmark202"))
    val bZ = Seq((1L, shared + " " + toks("x", 10)),
      (2L, toks("y", 30)),
      (102L, shared + " " + toks("w", 10)),
      (201L, toks("r", 25)))
    val input = MemoryStream[(Long, String)]
    val q = SubstrDedupIngest.start(input.toDF().toDF("doc_id", "text"),
      idxDir, cleanDir, ckpt, w = 20)
    try {
      Seq(bX, bY, bZ).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()

    // prefix semantics at ingest: 203 arrived first and was released
    // (no lower owner known yet); 3 was flagged on arrival (203's
    // windows carry owner 203 > 3? no — 3 IS lower, so 3 survives
    // ingest too: owner-aware cleaning only drops against LOWER ids);
    // later arrivals 1 and 102 judged against the true owners
    val streamedIds = spark.read.parquet(cleanDir).distinct()
      .select("doc_id").as[Long].collect().toSet
    assert(streamedIds.contains(203L), "prefix release: 203 predates 3 and 1")
    assert(streamedIds.contains(1L), "1 is the global keeper of its windows")
    assert(!streamedIds.contains(102L), "102 arrived after lower owners")

    // republish over the raw archive = the batch operator EXACTLY,
    // despite the shuffled delivery
    val corpus = (bX ++ bY ++ bZ).toDF("doc_id", "text")
    val republished = SubstrDedupIngest.republish(corpus, idxDir, w = 20)
      .collect().map(_.toSeq).toSet
    val batch = TextAnalysis.substringDedup(corpus, "doc_id", "text", w = 20)
      .collect().map(_.toSeq).toSet
    assert(republished == batch)
    assert(republished.map(_.head.asInstanceOf[Long]) ==
      Set(1L, 2L, 101L, 201L))
  }

  test("first batch runs against the legitimately-empty index") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sd2_").toString
    val batch = b1.toDF("doc_id", "text")
    SubstrDedupIngest.ingestBatch(batch, s"$tmp/idx", s"$tmp/clean",
      w = 20, idCol = "doc_id", textCol = "text")
    val kept = spark.read.parquet(s"$tmp/clean")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L)) // in-batch keep-first still applies
  }
}
