package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of the release data card
  * ([[graft.ops.Corpus.dataCard]]) — the running per-(source, lang)
  * ingestion totals an intake dashboard reads while a crawl streams in.
  *
  * Shape: each micro-batch reduces to slice-keyed PARTIALS (docs,
  * char/token sums, length extremes — all mergeable aggregates) and
  * appends them to a persistent partials table KEYED BY EPOCH ID;
  * [[report]] re-aggregates the partials into the running card.
  *
  * Idempotency under at-least-once replay (the `LineDedupIngest`
  * lesson): a replayed epoch re-appends byte-identical partial rows —
  * additive counts would silently double. `report` therefore dedups
  * partials on (epoch_id, slice) before merging, which is exact because
  * a batch's partials are a deterministic function of its content.
  *
  * Honest contract: the batch data card's `n_distinct_texts`/`dup_rate`
  * are NOT here — distinct-counts don't merge from per-batch partials
  * without corpus-sized hash state. The streaming card carries the
  * mergeable columns; run the batch card (or the dedup ingest faces)
  * for duplication accounting.
  */
object StatsIngest {

  def start(docs: DataFrame, statsDir: String, checkpointDir: String,
            sourceCol: String = "source", langCol: String = "lang",
            textCol: String = "text"): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], epoch: Long) =>
        ingestBatch(batch, statsDir, epoch, sourceCol, langCol, textCol)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  def ingestBatch(batch: DataFrame, statsDir: String, epochId: Long,
                  sourceCol: String, langCol: String,
                  textCol: String): Unit = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    val lt = lower(col(textCol))
    batch.select(col(sourceCol), col(langCol),
        length(col(textCol)).cast("long").as("__chars"),
        size(call_function("graft_word_grams", lt, lit(1), lit(false),
          lit(true))).cast("long").as("__toks"))
      .groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("sum_chars"),
        sum(col("__toks")).as("sum_toks"),
        min(col("__chars")).as("min_chars"),
        max(col("__chars")).as("max_chars"))
      .withColumn("epoch_id", lit(epochId))
      .write.mode("append").parquet(statsDir)
  }

  /** The running card from the persisted partials — safe to read at any
    * time, including mid-ingest.
    */
  def report(spark: SparkSession, statsDir: String,
             sourceCol: String = "source",
             langCol: String = "lang"): DataFrame =
    spark.read.parquet(statsDir)
      .dropDuplicates("epoch_id", sourceCol, langCol)
      .groupBy(col(sourceCol), col(langCol))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_chars")).as("total_chars"),
        sum(col("sum_toks")).as("total_tokens"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"))
      .withColumn("avg_tokens",
        round(col("total_tokens").cast("double") / col("n_docs"), 6))
}
