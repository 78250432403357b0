package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import java.sql.Timestamp

/** Column-level cleaning transforms.
  *
  * Semantics derived from the reference's pandas helpers
  * (`airflow/dags/brewery_etl/transformations/utils/helpers.py` in
  * rafaelarm2/breweries-etl), re-expressed as pure Catalyst expressions so
  * the whole chain fuses into one whole-stage-codegen pipeline over the
  * scan — no UDFs, no driver round-trips, scale-independent.
  */
object Cleaning {

  /** P1 — cast columns to string, skipping absent columns
    * (reference helpers.py:183-197, constants.py:18).
    *
    * The reference applies `astype(str)` AFTER the null-key split, so the
    * pandas `NaN -> "nan"` artifact never reaches key fields; we use a
    * null-safe `cast(StringType)` which is strictly saner and identical on
    * the post-split data. Call order must match (split first, then cast).
    */
  def castStrings(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(StringType)) else d
    }

  /** P2 — upper-case the location columns and derive `location` as a copy
    * of the (upper-cased) country (reference helpers.py:43-57). Null-safe:
    * `upper` preserves nulls exactly like pandas `.str.upper()`.
    */
  def standardizeLocations(
      df: DataFrame,
      stateCol: String = "state",
      cityCol: String = "city",
      countryCol: String = "country",
      locationCol: String = "location"): DataFrame = {
    val upped = Seq(stateCol, cityCol, countryCol).foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, upper(col(c))) else d
    }
    upped.withColumn(locationCol, col(countryCol))
  }

  /** P3 — recode a categorical column against a canonical vocabulary
    * (reference helpers.py:60-86, constants.py:19-30): null -> `unknown`,
    * else lower+trim then identity if canonical, else `other`.
    * Pure `when` chain — codegen'd, no map lookup at runtime.
    */
  def recodeType(
      df: DataFrame,
      column: String,
      canonical: Set[String],
      unknownLabel: String = "unknown",
      otherLabel: String = "other"): DataFrame = {
    val norm = lower(trim(col(column)))
    df.withColumn(
      column,
      when(col(column).isNull, lit(unknownLabel))
        .otherwise(when(norm.isInCollection(canonical), norm).otherwise(lit(otherLabel))))
  }

  /** The reference's canonical brewery-type vocabulary (constants.py:19-30). */
  val StandardBreweryTypes: Set[String] = Set(
    "micro", "nano", "regional", "brewpub", "large",
    "planning", "bar", "contract", "proprietor", "closed")

  /** P4 — URL normalization (reference helpers.py:89-113):
    * null/empty/whitespace-only -> null; else trim, and prepend `http://`
    * unless the value already matches `^https?://`.
    */
  def normalizeUrlCol(c: Column): Column = {
    val t = trim(c)
    when(c.isNull || t === "", lit(null).cast(StringType))
      .when(t.rlike("^https?://"), t)
      .otherwise(concat(lit("http://"), t))
  }

  def normalizeUrl(df: DataFrame, column: String): DataFrame =
    df.withColumn(column, normalizeUrlCol(col(column)))

  /** P5 — ingestion metadata (reference helpers.py:312-323). The timestamp
    * is materialized ONCE on the driver (the reference stamps the whole
    * batch with a single `datetime.now()`), not `current_timestamp()`,
    * keeping outputs deterministic and replayable.
    */
  def withIngestionMetadata(df: DataFrame, batchTs: Timestamp): DataFrame =
    df.withColumn("ingestion_timestamp", lit(batchTs))

  /** P6 — processing metadata (reference helpers.py:134-147):
    * `processed_at` is an ISO-8601 STRING (matching the reference, which
    * stores `datetime.now().isoformat()`), `etl_version` a constant.
    */
  def withProcessingMetadata(df: DataFrame, processedAtIso: String, etlVersion: String = "1.0"): DataFrame =
    df.withColumn("processed_at", lit(processedAtIso))
      .withColumn("etl_version", lit(etlVersion))

  /** P7 — per-column null fill (reference helpers.py:169-180; defined but
    * never called there — implemented for completeness).
    */
  def fillMissing(df: DataFrame, defaults: Map[String, Any]): DataFrame =
    df.na.fill(defaults)
}
