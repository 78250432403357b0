package graft.streaming

import graft.ops.QualityModel
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming deploy face of the in-engine quality classifier
  * ([[graft.ops.QualityModel]]): document micro-batches are scored
  * against a PERSISTED (feature, w) weight relation, every (doc_id,
  * score, pred) is appended to an audit directory, and documents at or
  * above `minScore` are appended to the kept corpus — the
  * `foreachBatch`-vs-stored-model shape of [[NearDupIngest]] and
  * [[DeconIngest]], completing the family symmetry (train once in
  * batch, serve forever on the stream).
  *
  * The weights are re-read from `weightsDir` every micro-batch (a
  * dim-bounded parquet — the read is trivially cheap): retraining just
  * overwrites the directory and the NEXT batch picks the new model up,
  * no stream restart. Per-doc scores are independent, so stream
  * results equal batch scoring of the union exactly (spec-pinned).
  *
  * Delivery contract: at-least-once, same as the other ingest faces —
  * replays append duplicate (doc_id, score) rows; both sinks are
  * append-grown tables whose readers dedup by id when exactness
  * matters.
  */
object ScoringIngest {

  def start(docs: DataFrame, weightsDir: String, scoresDir: String,
            keptDir: String, checkpointDir: String, dim: Int = 64,
            minScore: Double = 0.5, idCol: String = "doc_id",
            textCol: String = "text"): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        ingestBatch(batch, weightsDir, scoresDir, keptDir, dim, minScore,
          idCol, textCol)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  def ingestBatch(batch: DataFrame, weightsDir: String, scoresDir: String,
                  keptDir: String, dim: Int, minScore: Double,
                  idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    val w = spark.read.parquet(weightsDir)
    val scored = QualityModel.scoreHashedLogReg(batch, idCol, textCol, w, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scored.count() // one materialization for the two sinks
    scored.write.mode("append").parquet(scoresDir)
    batch.join(scored.filter(col("score") >= minScore).select(col(idCol)),
        Seq(idCol), "left_semi")
      .write.mode("append").parquet(keptDir)
    scored.unpersist()
  }
  /** Store hygiene (the family-wide compact face): rewrite both sinks
    * to one row per document — the documented reader dedup key —
    * through the atomic swap (scores are deterministic functions of
    * (text, weights); a replay under RETRAINED weights is the caller's
    * versioning concern, as documented above).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, scoresDir: String,
              keptDir: String, idCol: String = "doc_id"): Unit = {
    Stores.compactDedup(spark, scoresDir, Seq(idCol))
    Stores.compactDedup(spark, keptDir, Seq(idCol))
  }

}
