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
}
