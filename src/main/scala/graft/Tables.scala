package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-provided fixture tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. At 100 TB the same
  * call works on a directory of many files — `spark.read.parquet` handles
  * both; partition discovery, predicate pushdown and column pruning are
  * supplied by the Parquet datasource.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") readEvents(spark, sfDir) else
      spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` has arrived under THREE physical encodings across fixture
    * generations — parquet TIMESTAMP(NANOS) (a raw-nanos long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which Verify/Bench/
    * SparkSpec still set for backward compatibility), naive micros
    * (`timestamp[us]`, isAdjustedToUTC=false — Spark 4 infers
    * `TIMESTAMP_NTZ`), and UTC-adjusted micros (`TimestampType`). This
    * boundary normalizes EVERY arrival to `TimestampType` so no operator
    * downstream depends on reader behavior or fixture vintage. Sessions
    * pin `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast preserves
    * the wall-clock value DuckDB's oracle sees on the same naive column.
    */
  private def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => sys.error(s"events.ts arrived as unsupported type $other")
    }
  }

  def region(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
