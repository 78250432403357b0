package graft.streaming

import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming exact-substring deduplication: the ingestion-time face of
  * [[graft.ops.TextAnalysis.substringDedup]] (Lee et al. w-token-window
  * family). A PERSISTENT window index — one `s` column of md5 window
  * keys, append-grown per micro-batch — carries every window of every
  * document ever ingested (kept AND dropped: batch keep-first flags
  * against all lower-id docs, not just survivors, so the index must
  * too). Each batch is cleaned batch-vs-index plus batch-internal
  * keep-first, then contributes its own windows.
  *
  * With id-ordered ingestion this EQUALS the batch operator exactly
  * (SubstrDedupIngestSpec pins the parity); out-of-order ingestion
  * degrades gracefully to "first ingested wins", the same contract as
  * every other incremental dedup face here.
  *
  * Scale posture: per batch, one shingle pass over the batch only (the
  * ingested corpus is NEVER re-shingled — its windows are the stored
  * index), one join of batch windows against the index (shuffle on the
  * fixed-width key), and a batch-sized anti-join. The index grows with
  * corpus token count; [[compactIndex]] collapses the append
  * duplicates. Delivery is at-least-once (plain-file sinks): replayed
  * appends add duplicate keys (harmless — the join collapses them) and
  * duplicate clean rows (dedup on read by id, the house contract).
  */
object SubstrDedupIngest {

  private val indexSchema = StructType(Seq(StructField("s", StringType)))

  /** Append `batch`'s distinct window keys to the index. */
  def updateIndex(batch: DataFrame, indexDir: String, idCol: String,
                  textCol: String, w: Int): Unit =
    TextAnalysis.substringWindows(batch, idCol, textCol, w)
      .select(col("s")).distinct()
      .write.mode("append").parquet(indexDir)

  /** Read the window index, empty-safe: the FIRST batch legitimately
    * starts with no index (unlike DeconIngest, where a missing benchmark
    * is a configuration error).
    */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    if (hasData) spark.read.parquet(indexDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], indexSchema)
  }

  /** Start the ingest: cleaned rows append to `cleanDir`; every batch's
    * windows extend the index at `indexDir`.
    */
  def start(docs: DataFrame, indexDir: String, cleanDir: String,
            checkpointDir: String, w: Int,
            idCol: String = "doc_id", textCol: String = "text")
      : StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        ingestBatch(batch, indexDir, cleanDir, w, idCol, textCol)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One ingest step (also directly usable from a batch scheduler).
    * The flagged set is eagerly materialized inside
    * [[TextAnalysis.substringDedupIndexed]] BEFORE the index append, so
    * the batch never self-flags against its own contribution.
    */
  def ingestBatch(batch: DataFrame, indexDir: String, cleanDir: String,
                  w: Int, idCol: String, textCol: String): Unit = {
    val index = readIndex(batch.sparkSession, indexDir)
    TextAnalysis.substringDedupIndexed(batch, index, idCol, textCol, w)
      .write.mode("append").parquet(cleanDir)
    updateIndex(batch, indexDir, idCol, textCol, w)
  }

  /** Collapse the append-grown duplicate keys (same atomic-swap contract
    * as [[NearDupIngest.compactTable]]).
    */
  def compactIndex(spark: SparkSession, indexDir: String,
                   numFiles: Int): Unit =
    graft.pipeline.Pipeline.atomicOverwrite(spark,
      spark.read.parquet(indexDir).distinct().repartition(numFiles),
      indexDir)
}
