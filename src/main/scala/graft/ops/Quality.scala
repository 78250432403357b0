package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality operators: validation, quarantine split, diagnostics.
  *
  * Semantics derived from the reference's `bronze_to_silver.py` and
  * `utils/helpers.py` (rafaelarm2/breweries-etl).
  */
object Quality {

  /** F2 — required-columns presence check (reference helpers.py:23-40).
    * Name-presence only, no type check — same contract. Driver-side
    * assertion against the schema, costs nothing at runtime.
    */
  def requireColumns(df: DataFrame, expected: Seq[String]): Unit = {
    val missing = expected.toSet -- df.columns.toSet
    require(missing.isEmpty, s"Missing required columns: ${missing.toSeq.sorted.mkString(", ")}")
  }

  /** F1 — null-key split (reference bronze_to_silver.py:164-204).
    *
    * Returns (valid, quarantine). A row is quarantined iff ANY key column
    * is null; quarantine rows are enriched with `quarantine_reason` and
    * `quarantine_timestamp`. One lazy plan each; Catalyst pushes both
    * predicates into the scan, so at scale this is two pushdown-filtered
    * reads (or one shared scan when cached), never a driver materialize.
    *
    * The timestamp is injected (a single driver-side value) for
    * deterministic, hashable outputs, and carried as an ISO-8601 STRING to
    * match the reference's quarantine schema exactly
    * (`datetime.now().isoformat()`, bronze_to_silver.py:183).
    */
  def nullKeySplit(
      df: DataFrame,
      keyCols: Seq[String],
      quarantineReason: String = "missing_key_values",
      quarantineTsIso: String = "2026-01-01T00:00:00"
  ): (DataFrame, DataFrame) = {
    val anyNull  = keyCols.map(col(_).isNull).reduce(_ || _)
    val noneNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val valid = df.filter(noneNull)
    val quarantine = df.filter(anyNull)
      .withColumn("quarantine_reason", lit(quarantineReason))
      .withColumn("quarantine_timestamp", lit(quarantineTsIso))
    (valid, quarantine)
  }

  /** F3 — duplicate-id diagnostic (reference helpers.py:116-131; defined
    * but never called there). Returns ids occurring more than once with
    * their multiplicities. Partial hash-agg + final agg — no skew risk
    * beyond the natural key distribution.
    */
  def duplicateIds(df: DataFrame, idCol: String = "id"): DataFrame =
    df.groupBy(col(idCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Count of duplicated ids (scalar form used by the reference's gauge).
    * One aggregate job instead of two separate scans. NULL parity with
    * pandas `duplicated()` (NaN == NaN there): the null group counts as
    * one distinct value, so `count(*) - count(distinct id) - [any null]`.
    */
  def duplicateIdCount(df: DataFrame, idCol: String = "id"): Long =
    df.agg((count(lit(1)) - countDistinct(col(idCol)) -
      coalesce(max(when(col(idCol).isNull, 1).otherwise(0)), lit(0))).as("d"))
      .head().getLong(0)

  /** A7 — per-field null counts in a single job
    * (reference bronze_to_silver.py:185-188 runs one `isna().sum()` per
    * field; we fuse them into one aggregate pass).
    */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => count(when(col(c).isNull, 1)).as(s"${c}_nulls")): _*)
}
