package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table support for co-located joins (the pre-shuffle answer to
  * repeated large-scale joins on the same key).
  *
  * Writing both sides of a hot join bucketed (+ sorted) by the join key
  * means every subsequent join between them is exchange-free: Spark reads
  * matching buckets pairwise instead of hash-partitioning terabytes per
  * query. At 100 TB this converts the dominant recurring shuffle into a
  * one-time write cost. `BucketedSpec` asserts the exchange-free plan.
  */
object BucketedTables {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * registered in the session catalog (bucketing metadata lives in the
    * catalog, so `spark.table(name)` is the read path).
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    bucketCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(name)

  /** Exchange-free equi-join of two co-bucketed tables. */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
                    left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
