package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy map pipelines over few-split
  * inputs. Local fixture tables are single-row-group parquet files, so a
  * scan yields ONE task and per-row-expensive operators (hashing,
  * n-gram explosion) would run on one core of 32. At 100 TB a scan has
  * thousands of splits and this is a no-op — the corpus is never
  * reshuffled just to redistribute.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
