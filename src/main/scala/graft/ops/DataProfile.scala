package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass multi-column profiling — the engine's DESCRIBE/data-quality
  * surface (per-column row counts, null counts, distinct counts, range
  * and mean), computed in a SINGLE scan of the table.
  *
  * The naive profiler runs one job per column (N scans of a 100 TB
  * table); this one folds every column's statistics into ONE aggregation
  * — the only row multiplication is Catalyst's Expand for the exact
  * multi-column COUNT(DISTINCT), the same plan shape a SQL engine gives
  * `count(distinct a), count(distinct b)`. The single result row is then
  * unpivoted driver-free via `inline(array(struct(...)))`.
  *
  * Numeric means ride the repo's determinism convention: DECIMAL(18,4)
  * sums (exact accumulation, order-independent) with ONE terminal
  * double division rounded to 1e-6 — never a floating-point sum.
  */
object DataProfile {

  /** Profile `cols` (numeric and string columns) of `df` in one pass.
    * Output: one row per column —
    * (col_name, n, n_null, n_distinct, min_num, max_num, mean,
    *  min_str, max_str); the *_num/mean stats are null for string
    * columns and vice versa, so every emitted value keeps its native
    * comparison semantics (no stringified doubles to drift on format).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    val kinds: Map[String, Boolean] = cols.map { c =>
      schema(c).dataType match {
        case _: NumericType => c -> true
        case StringType     => c -> false
        case other => sys.error(
          s"profile supports numeric and string columns, $c is $other")
      }
    }.toMap

    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val base = Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
      if (kinds(c)) base ++ Seq(
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(col(c).cast("decimal(18,4)")).as(s"__sum_$c"))
      else base ++ Seq(
        min(col(c)).as(s"__mins_$c"),
        max(col(c)).as(s"__maxs_$c"))
    }

    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val numeric = kinds(c)
      struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        (if (numeric) round(col(s"__min_$c"), 6)
         else lit(null).cast("double")).as("min_num"),
        (if (numeric) round(col(s"__max_$c"), 6)
         else lit(null).cast("double")).as("max_num"),
        (if (numeric)
           round(col(s"__sum_$c").cast("double") / col(s"__nn_$c"), 6)
         else lit(null).cast("double")).as("mean"),
        (if (numeric) lit(null).cast("string")
         else col(s"__mins_$c")).as("min_str"),
        (if (numeric) lit(null).cast("string")
         else col(s"__maxs_$c")).as("max_str"))
    }
    one.select(inline(array(rows: _*)))
  }
}
