package graft.streaming

import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming line-level deduplication: the ingestion-time face of
  * [[graft.ops.TextAnalysis.lineDedup]] (the C4/RefinedWeb boilerplate
  * rule). A PERSISTENT line-frequency index (an ordinary parquet table
  * of (line, n_docs) partials, append-grown per micro-batch) carries
  * the corpus's line history; each batch first contributes its own
  * per-doc-distinct line counts, then is cleaned against the CUMULATIVE
  * index and appended to the release corpus.
  *
  * Semantics are PREFIX semantics, stated honestly: a line is stripped
  * from a document iff the line has reached `minDocs` distinct documents
  * among everything ingested UP TO AND INCLUDING that document's batch.
  * Frequency-based dedup is inherently retrospective — copies of a
  * footer released before it crossed the threshold are already
  * published; the periodic [[republish]] pass (the same indexed operator
  * over the accumulated corpus) converges the release to EXACT batch
  * parity, which is what LineDedupIngestSpec pins.
  *
  * Scale posture: per batch, one map-side distinct-line pass + one
  * (line, partial)-row append (no text shuffles into the index), one
  * re-aggregation of the index's partials, and a shuffled anti-join of
  * the batch's lines — the frequent-line set is corpus-scale under
  * heavy boilerplate, so nothing is collected or broadcast
  * ([[graft.ops.TextAnalysis.lineDedupIndexed]]'s posture). Per-batch
  * cost grows only with the index's distinct-line count, compacted by
  * [[compactLineIndex]].
  *
  * Delivery contract: `foreachBatch` is at-least-once for plain-file
  * sinks — a retried batch can append its partials and clean rows
  * twice. The release table is keyed by document id (dedup on read or a
  * transactional sink upgrades to exactly-once); a double-appended
  * PARTIAL inflates a line's count, which [[republish]] also repairs —
  * the same contract family as [[NearDupIngest]] / [[DeconIngest]].
  */
object LineDedupIngest {

  /** Append `batch`'s per-doc-distinct line counts to the index. */
  def updateLineIndex(batch: DataFrame, indexDir: String,
                      textCol: String = "text"): Unit =
    TextAnalysis.lineDocCounts(batch, textCol)
      .write.mode("append").parquet(indexDir)

  /** Start the ingest: each micro-batch updates the line index, then
    * appends its cleaned rows (`idCol`, `clean_text`) to `cleanDir`.
    */
  def start(docs: DataFrame, indexDir: String, cleanDir: String,
            checkpointDir: String, minDocs: Long,
            idCol: String = "doc_id", textCol: String = "text")
      : StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        ingestBatch(batch, indexDir, cleanDir, minDocs, idCol, textCol)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One ingest step (also directly usable from a batch scheduler):
    * contribute the batch's counts, clean it against the cumulative
    * index, append the survivors.
    */
  def ingestBatch(batch: DataFrame, indexDir: String, cleanDir: String,
                  minDocs: Long, idCol: String, textCol: String): Unit = {
    updateLineIndex(batch, indexDir, textCol)
    val counts = batch.sparkSession.read.parquet(indexDir)
    TextAnalysis.lineDedupIndexed(batch, counts, idCol, textCol, minDocs)
      .write.mode("append").parquet(cleanDir)
  }

  /** Retrospective republish: re-clean an accumulated RAW corpus against
    * the full index — the convergence pass that removes boilerplate
    * released before it crossed the threshold. Run periodically (like
    * index compaction), or over `corpus` = the raw ingest archive when
    * the release must exactly match the batch operator.
    */
  def republish(corpus: DataFrame, indexDir: String, minDocs: Long,
                idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    TextAnalysis.lineDedupIndexed(corpus,
      corpus.sparkSession.read.parquet(indexDir), idCol, textCol, minDocs)

  /** Compact the append-grown partial counts (thousands of micro-appends
    * → `numFiles`, one row per line). Same atomic-swap contract as
    * [[NearDupIngest.compactTable]].
    */
  def compactLineIndex(spark: SparkSession, indexDir: String,
                       numFiles: Int): Unit =
    graft.pipeline.Pipeline.atomicOverwrite(spark,
      spark.read.parquet(indexDir)
        .groupBy(col("line")).agg(sum(col("n_docs")).as("n_docs"))
        .repartition(numFiles),
      indexDir)
}
