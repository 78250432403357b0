package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

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

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set ONCE at session
    * build by Verify/Bench/SparkSpec — not mutated here, so session
    * behavior is order-independent) the column arrives as raw nanos;
    * truncate to a proper micros TimestampType — the same truncation
    * DuckDB applies on `CAST(ts AS TIMESTAMP)`, keeping oracle parity.
    */
  private def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build to read events")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
