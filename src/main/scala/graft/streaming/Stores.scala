package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared store-directory plumbing for the streaming ingests. */
private[streaming] object Stores {

  /** Whether `dir` holds at least one parquet file — the "has this
    * store ever been written?" check every ingest's first batch needs
    * (an empty/missing store reads as a typed empty relation instead).
    */
  def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Store hygiene shared by the content-keyed index/pair families
    * (r19): rewrite `dir` to its read-side replay-dedup fixpoint — one
    * row per `keys` tuple — through the atomic swap. Exact for stores
    * whose reads already `dropDuplicates(keys)` (replayed deliveries
    * append identical rows there); collapses the duplicates AND the
    * one-file-per-append fragmentation a long-running at-least-once
    * deployment accumulates. No-op on a never-written store.
    *
    * Quiesce contract (family-wide — every per-family `compact` routes
    * through here or through [[graft.pipeline.Pipeline.atomicOverwrite]]
    * directly): stop the store's StreamingQuery before compacting.
    * Rows appended by a live ingest between the lazy read and the swap
    * belong to the old generation and would be deleted with it; the
    * swap-time guard in `atomicOverwrite` detects files appended during
    * the rewrite and ABORTS loudly (store untouched) rather than lose
    * them silently.
    */
  def compactDedup(spark: SparkSession, dir: String,
                   keys: Seq[String]): Unit =
    if (hasParquet(spark, dir))
      graft.pipeline.Pipeline.atomicOverwrite(spark,
        spark.read.parquet(dir).dropDuplicates(keys), dir)
}
