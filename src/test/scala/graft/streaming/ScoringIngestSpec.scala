package graft.streaming

import graft.SparkSpec
import graft.ops.QualityModel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-vs-batch parity for streaming classifier scoring: per-doc
  * scores are model-and-document functions only, so micro-batched
  * scoring against the stored weights must equal batch scoring of the
  * whole corpus, and the kept sink must hold exactly the documents at
  * or above the threshold.
  */
class ScoringIngestSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched scoring equals batch scoring; kept sink thresholds") {
    implicit val ctx = spark.sqlContext
    val docsDf = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val docs = docsDf.as[(Long, String)].collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_sci_").toString
    val (wDir, scoresDir, keptDir, ckpt) =
      (s"$tmp/weights", s"$tmp/scores", s"$tmp/kept", s"$tmp/ckpt")

    // train in batch on the corpus, persist the model as the stream's input
    val w = QualityModel.trainHashedLogReg(docsDf, "doc_id", "text",
      when(col("doc_id") % 4 === 0, 1).otherwise(0), dim = 64,
      lr = 0.5, iters = 2)
    w.write.parquet(wDir)

    // pick a threshold that splits the fixture's score distribution
    val batchScores = QualityModel.scoreHashedLogReg(docsDf, "doc_id",
      "text", spark.read.parquet(wDir), 64)
    val cut = batchScores.agg(
      call_function("percentile", col("score"), lit(0.5))).as[Double]
      .collect().head

    val input = MemoryStream[(Long, String)]
    val q = ScoringIngest.start(input.toDF().toDF("doc_id", "text"),
      wDir, scoresDir, keptDir, ckpt, dim = 64, minScore = cut)
    try {
      docs.grouped(math.max(docs.size / 3 + 1, 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(scoresDir)
      .select("doc_id", "score", "pred").distinct()
      .collect().map(_.toSeq).toSet
    val batch = batchScores.collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)

    val keptIds = spark.read.parquet(keptDir).select("doc_id")
      .as[Long].collect().toSet
    val expected = batchScores.filter(col("score") >= cut)
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == expected && expected.nonEmpty)
    assert(expected.size < docs.size) // the threshold actually splits

    // replay + compact: duplicate (doc_id, score) rows collapse to the
    // documented reader dedup key; both sinks read identically after
    ScoringIngest.ingestBatch(docs.take(3).toDF("doc_id", "text"),
      wDir, scoresDir, keptDir, dim = 64, minScore = cut,
      idCol = "doc_id", textCol = "text", epoch = 0L)
    val rawBefore = spark.read.parquet(scoresDir).count()
    ScoringIngest.compact(spark, scoresDir, keptDir, minScore = cut)
    assert(spark.read.parquet(scoresDir).count() < rawBefore,
      "replayed score rows should collapse")
    assert(spark.read.parquet(scoresDir)
      .select("doc_id", "score", "pred").distinct()
      .collect().map(_.toSeq).toSet == batch, "compact changed scores")
    assert(spark.read.parquet(keptDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == expected,
      "compact changed the kept corpus")

    // replay SPANNING a retrain (ADVICE r19): the store now holds two
    // genuinely different score rows for the replayed docs; compact
    // must keep the min-epoch delivery deterministically, so the read
    // face still equals the ORIGINAL batch scores
    val w2 = QualityModel.trainHashedLogReg(docsDf, "doc_id", "text",
      when(col("doc_id") % 3 === 0, 1).otherwise(0), dim = 64,
      lr = 0.9, iters = 3)
    w2.write.mode("overwrite").parquet(wDir)
    ScoringIngest.ingestBatch(docs.take(3).toDF("doc_id", "text"),
      wDir, scoresDir, keptDir, dim = 64, minScore = cut,
      idCol = "doc_id", textCol = "text", epoch = 99L)
    val readFace = ScoringIngest.scores(spark, scoresDir)
      .select("doc_id", "score", "pred").collect().map(_.toSeq).toSet
    assert(readFace == batch,
      "read-side dedup must resolve a retrain-spanning replay to the " +
        "min-epoch delivery")
    ScoringIngest.compact(spark, scoresDir, keptDir, minScore = cut)
    assert(spark.read.parquet(scoresDir)
      .select("doc_id", "score", "pred").collect().map(_.toSeq).toSet
      == batch,
      "compact must keep the min-epoch row under a retrain-spanning replay")
    assert(spark.read.parquet(scoresDir).count() == batch.size)
    // r21 (ADVICE r20): after the retrain-spanning replay, the kept sink
    // must agree with the SURVIVING (min-epoch) scores — a doc admitted
    // under the retrained weights whose canonical score fails the cut is
    // reconciled OUT, so the two sinks can never disagree about corpus
    // membership
    assert(spark.read.parquet(keptDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == expected,
      "kept sink must match the surviving scores' membership after a " +
        "retrain-spanning replay compact")
    spark.catalog.clearCache()
  }
}
