package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional physical layout: Z-order (Morton) clustering.
  *
  * A single-column sort bounds only its sort key per file: every file
  * spans the FULL range of every other column, so parquet row-group
  * min/max stats prune nothing for queries on those columns. Z-order
  * interleaves the bits of two (or more) key columns so consecutive
  * z-values trace space-filling-curve tiles — each written file covers a
  * bounded box in EVERY clustered dimension, and a 2-d range predicate
  * skips the files whose box misses it. This is the standard lakehouse
  * layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`), reproduced here on
  * plain parquet with Spark primitives: compute z, range-partition on
  * it, sort within partitions, write through the crash-safe swap.
  *
  * Correctness contract: layout NEVER changes query results — the
  * oracle for the roundtrip query is the same SQL over the unsorted
  * table; only the file-skipping economics change (LayoutSpec measures
  * per-file bounding boxes shrinking in BOTH dimensions vs a
  * single-column sort).
  */
object Layout {

  /** Morton z-value of two non-negative int columns, `bits` bits each
    * (clamped — values beyond 2^bits-1 share the top tile rather than
    * erroring; layout keys are allowed to saturate because layout can
    * never affect correctness). Unrolled static shifts keep the whole
    * expression in codegen; bit j of x lands at z-bit 2j, y at 2j+1.
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val cap = lit((1L << bits) - 1)
    val xc = least(greatest(x.cast("long"), lit(0L)), cap)
    val yc = least(greatest(y.cast("long"), lit(0L)), cap)
    (0 until bits).map { j =>
      shiftleft(call_function("getbit", xc, lit(j)).cast("long"), 2 * j) +
        shiftleft(call_function("getbit", yc, lit(j)).cast("long"), 2 * j + 1)
    }.reduce(_ + _)
  }

  /** Write `df` z-clustered on two int-like columns into ~`numFiles`
    * files at `path` (atomic swap). Range partitioning on z gives each
    * output file a contiguous z-run = a bounded tile in both dims.
    */
  def zorderWrite(spark: SparkSession, df: DataFrame, path: String,
                  xCol: String, yCol: String, bits: Int,
                  numFiles: Int): Unit = {
    val z = df.withColumn("__z", zValue2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    Pipeline.atomicOverwrite(spark, z, path)
  }

  /** Per-file bounding boxes of two columns — the audit face LayoutSpec
    * and the ladder use to SHOW the clustering (mean normalized extent
    * per dimension; 1.0 = every file spans the full range, i.e. no
    * skipping possible on that dimension).
    */
  def fileBoxes(spark: SparkSession, path: String,
                xCol: String, yCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"),
        count(lit(1)).as("n_rows"))

  /** Manifest path convention for [[zorderWriteIndexed]]. */
  def manifestPath(path: String): String = path + "_manifest"

  /** [[zorderWrite]] plus a persisted file-level min/max manifest — the
    * Iceberg/Delta data-skipping planning layer on plain parquet. The
    * manifest is file-count-sized and written ONCE at layout time
    * (amortized over every later scan); [[skippingScan]] then plans
    * against it instead of listing/opening data files.
    */
  def zorderWriteIndexed(spark: SparkSession, df: DataFrame, path: String,
                         xCol: String, yCol: String, bits: Int,
                         numFiles: Int): Unit = {
    zorderWrite(spark, df, path, xCol, yCol, bits, numFiles)
    Pipeline.atomicOverwrite(spark, fileBoxes(spark, path, xCol, yCol),
      manifestPath(path))
  }

  /** Files whose bounding box intersects the query box — driver-side
    * planning, manifest-sized (exactly how table formats plan scans).
    */
  def selectFiles(spark: SparkSession, path: String,
                  xLo: Long, xHi: Long, yLo: Long, yHi: Long): Seq[String] =
    spark.read.parquet(manifestPath(path))
      .filter(!(col("x_max") < xLo || col("x_min") > xHi ||
        col("y_max") < yLo || col("y_min") > yHi))
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Scan only the files that can contain rows in the 2-d range box,
    * with the residual predicate still applied — result is EXACTLY the
    * full-table filter (pruned files provably hold no matching rows).
    */
  def skippingScan(spark: SparkSession, path: String,
                   xCol: String, yCol: String,
                   xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val pred = col(xCol).between(xLo, xHi) && col(yCol).between(yLo, yHi)
    val files = selectFiles(spark, path, xLo, xHi, yLo, yHi)
    if (files.isEmpty)
      // keep the schema without reading data: footer-only scan of an
      // always-false predicate over the table root
      spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files: _*).filter(pred)
  }
}
