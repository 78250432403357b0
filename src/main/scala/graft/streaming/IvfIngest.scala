package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming index maintenance for the IVF ANN family
  * ([[graft.ops.Similarity.ivfTopKIndexed]]): a production vector-search
  * deployment trains its quantizer once, then ingests embeddings
  * forever — new vectors are ASSIGNED to the frozen codebook (map-side
  * broadcast argmax, corpus touched once per batch) and appended to the
  * stored index; serving reads the accumulated index with
  * corpus-independent per-query cost, exactly as the batch surface
  * does. No retraining on the hot path: codebook drift is a MONITORED
  * property ([[balanceAudit]] — when new data stops fitting the frozen
  * cells, occupancy skew says so and a retrain + reassign is an offline
  * decision), which is how IVF deployments actually run.
  *
  * Delivery contract: at-least-once — assignment is deterministic
  * (frozen codebook, id-ordered ties), so a replayed vector appends a
  * bit-identical index row and [[index]] dedups on vec_id. Purge drops
  * a vector from the stored index through the atomic swap;
  * re-ingesting a copy later is indistinguishable from a first ingest.
  */
object IvfIngest {

  def start(vectors: DataFrame, codebookDir: String, indexDir: String,
            checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        ingestBatch(batch, codebookDir, indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Freeze a trained codebook `(vec_id, embedding)` as the
    * deployment's quantizer (atomic overwrite — a crash mid-write never
    * surfaces a half codebook). Train it with
    * [[graft.ops.Similarity.kmeansTrain]] or any (id, vector) relation.
    */
  def freezeCodebook(codebook: DataFrame, codebookDir: String): Unit =
    graft.pipeline.Pipeline.atomicOverwrite(codebook.sparkSession,
      codebook.select(col("vec_id"), col("embedding")), codebookDir)

  /** One ingest step (also directly usable from a batch scheduler).
    * Input columns: vec_id, embedding. Fails loudly when no codebook
    * has been frozen — assigning against nothing would silently build
    * an unsearchable index.
    */
  def ingestBatch(batch: DataFrame, codebookDir: String,
                  indexDir: String): Unit = {
    val spark = batch.sparkSession
    require(Stores.hasParquet(spark, codebookDir),
      s"IvfIngest: no frozen codebook at $codebookDir — call " +
        "freezeCodebook(trainedCentroids, dir) before ingesting")
    val recs = batch.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    recs.count() // materialize before the store append below
    Similarity.ivfAssign(recs, spark.read.parquet(codebookDir))
      .write.mode("append").parquet(indexDir)
    recs.unpersist()
  }

  /** The accumulated assignment index, replay-deduped — row-identical
    * to [[graft.ops.Similarity.ivfAssign]] over everything ingested
    * (assignment against the frozen codebook is deterministic, so
    * duplicate deliveries append bit-identical rows).
    */
  def index(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(indexDir).dropDuplicates("vec_id")

  /** Serve top-k queries from the accumulated index — the batch
    * [[graft.ops.Similarity.ivfTopKIndexed]] surface over the streaming
    * store; per-query cost rides nprobe cells, never the corpus.
    */
  def serve(spark: SparkSession, codebookDir: String, indexDir: String,
            queries: DataFrame, nprobe: Int, k: Int): DataFrame =
    Similarity.ivfTopKIndexed(index(spark, indexDir),
      spark.read.parquet(codebookDir), queries, nprobe, k)

  /** Codebook-drift monitor: per-cell occupancy of the accumulated
    * index plus the skew summary a retrain decision reads — max/mean
    * occupancy ratio and the hottest cell's share. A frozen quantizer
    * serving drifted data shows up here as runaway skew (everything new
    * piles into a few cells), degrading probe selectivity long before
    * recall collapses.
    */
  def balanceAudit(spark: SparkSession, indexDir: String): DataFrame = {
    val occ = index(spark, indexDir)
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vectors"))
    val tot = occ.agg(sum(col("n_vectors")).as("__n"),
      count(lit(1)).as("__cells"), max(col("n_vectors")).as("__max"))
    occ.crossJoin(broadcast(tot))
      .select(col("centroid_id"), col("n_vectors"),
        round(col("n_vectors").cast("double") / col("__n"), 6)
          .as("share"),
        round(col("__max").cast("double") * col("__cells") / col("__n"), 6)
          .as("skew_ratio"))
  }

  /** Right-to-be-forgotten: drop vectors from the stored index through
    * the atomic swap. Returns rows removed.
    */
  def purge(spark: SparkSession, vecIds: DataFrame,
            indexDir: String): Long =
    graft.pipeline.Pipeline.purgeIds(spark, indexDir, vecIds,
      Seq("vec_id"))

  /** Store hygiene (the family-wide compact face): rewrite the index to
    * its read-side fixpoint — one row per vec_id — through the atomic
    * swap. The store grows only by replayed deliveries (assignment is
    * deterministic, so duplicates are bit-identical and [[index]]
    * dedups them on read), so compaction here is file/size hygiene for
    * long-running at-least-once deployments, not a correctness
    * dependency; QUIESCED reads before and after a compact see the
    * same relation. Quiesce contract: stop the ingest first — rows a
    * live writer appends during the rewrite belong to the old
    * generation and would be deleted with it; `atomicOverwrite`'s
    * swap-time guard detects such appends and aborts the swap loudly
    * ([[Stores.compactDedup]]).
    */
  def compact(spark: SparkSession, indexDir: String): Unit =
    graft.pipeline.Pipeline.atomicOverwrite(spark,
      index(spark, indexDir), indexDir)

}
