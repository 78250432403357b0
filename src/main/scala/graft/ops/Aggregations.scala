package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators.
  *
  * Semantics derived from the reference's `utils/helpers.py:496-509` and
  * `silver_to_gold.py:102-131` (rafaelarm2/breweries-etl). All lower to
  * Catalyst hash aggregates: partial (map-side) agg -> shuffle on the
  * group keys -> final agg, so the shuffle carries one row per
  * (partition, group), not per input row — the shape that survives 100 TB.
  */
object Aggregations {

  /** A1 — generic group-count: COUNT(*) per key tuple, count column named
    * by the caller (reference helpers.py:496-509). The reference's pandas
    * groupby drops null-keyed groups, but it only ever runs on silver
    * columns guaranteed non-null by F1; `groupBy` on non-null keys is
    * observationally identical to `GROUP BY`.
    */
  def groupCount(df: DataFrame, keys: Seq[String], countName: String = "count"): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as(countName))

  /** A2 — gold aggregation `by_type_location`
    * (reference silver_to_gold.py:117-119).
    */
  def goldByTypeLocation(silver: DataFrame): DataFrame =
    groupCount(silver, Seq("brewery_type", "location", "state", "city"), "brewery_count")

  /** A3 — gold aggregation `by_location`
    * (reference silver_to_gold.py:120-122).
    */
  def goldByLocation(silver: DataFrame): DataFrame =
    groupCount(silver, Seq("location", "state", "city"), "brewery_count")

  /** A2+A3 in ONE pass via grouping sets: the reference computes the two
    * gold aggregations independently (two scans, two shuffles); since A3's
    * keys are a subset of A2's, a single grouping-sets aggregate produces
    * both with one scan and one shuffle — at 100 TB, half the gold-stage
    * cost. `is_by_location` = 1 marks the rolled-up (A3) rows.
    */
  def goldGroupingSets(silver: DataFrame): DataFrame =
    silver
      .groupingSets(
        Seq(Seq(col("brewery_type"), col("location"), col("state"), col("city")),
          Seq(col("location"), col("state"), col("city"))),
        col("brewery_type"), col("location"), col("state"), col("city"))
      .agg(count(lit(1)).as("brewery_count"),
        grouping(col("brewery_type")).cast("int").as("is_by_location"))

  /** A4 — exact distinct count (reference bronze_to_silver.py:83-84 uses
    * `nunique`, which is exact — so no approx_count_distinct here; the
    * approximate variant is offered separately for the 100 TB path).
    */
  def distinctCount(df: DataFrame, column: String): Long =
    df.select(column).distinct().count()

  /** Approximate distinct (HLL++) — the scale-path alternative to A4. */
  def approxDistinct(df: DataFrame, column: String, rsd: Double = 0.01): DataFrame =
    df.agg(approx_count_distinct(col(column), rsd).as(s"${column}_approx_distinct"))

  /** A5 — value counts, most frequent first
    * (reference helpers.py:83 `value_counts()`).
    */
  def valueCounts(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column)).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(column).asc)

  /** A6 — row count (used for record metrics throughout the reference). */
  def rowCount(df: DataFrame): Long = df.count()

  /** 2D SKYLINE (pareto frontier, both dimensions MINIMIZED): the rows
    * no other row dominates — r' dominates r iff x' ≤ x ∧ y' ≤ y with
    * at least one strict (Börzsönyi, Kossmann & Stocker, "The Skyline
    * Operator", ICDE 2001). Ties on BOTH dims survive together
    * (neither dominates the other).
    *
    * Scale shape — the naive formulation is a quadratic NOT-EXISTS
    * self-join; this one is two aggregates and one small window:
    * (1) per distinct x, the min y (corpus → x-cardinality rows, one
    * shuffle with map-side partials); (2) running mins over x
    * ascending — a GLOBAL window, deliberately: it runs on the
    * x-cardinality-sized aggregate, never the corpus (the funnelReport
    * convention); (3) one broadcast-sized join back. A row survives
    * iff y ≤ runmin≤(x) (it IS its x-group's frontier value and
    * nothing cheaper exists at smaller-or-equal x) AND y < runmin<(x)
    * (nothing at strictly smaller x ties it — that tie would dominate
    * strictly on x).
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame =
    skyline2DBy(df, Nil, xCol, yCol)

  /** GROUP-WISE 2D skyline: an independent pareto frontier per group
    * (frontier-per-brand, frontier-per-supplier — the window
    * partitions by the group, so one hot group costs a sort of ITS
    * x-cardinality, never a global one; everything else is identical
    * to [[skyline2D]], which is this with no group).
    */
  def skyline2DBy(df: DataFrame, groupCols: Seq[String], xCol: String,
                  yCol: String): DataFrame = {
    val gs = groupCols.map(col)
    val keys = groupCols :+ xCol
    val perX = df.groupBy(keys.map(col): _*)
      .agg(min(col(yCol)).as("__miny"))
    val wLe = Window.partitionBy(gs: _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLt = Window.partitionBy(gs: _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fronts = perX
      .withColumn("__rm_le", min(col("__miny")).over(wLe))
      .withColumn("__rm_lt", min(col("__miny")).over(wLt))
      .select((keys.map(col) :+ col("__rm_le") :+ col("__rm_lt")): _*)
    df.join(broadcast(fronts), keys)
      .filter(col(yCol) <= col("__rm_le") &&
        (col("__rm_lt").isNull || col(yCol) < col("__rm_lt")))
      .drop("__rm_le", "__rm_lt")
  }
}
