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

  /** Estimated driver bytes per hashed ungrouped-frontier row — (x,
    * 2 running mins) of at-most-8-byte numerics plus hashed-relation
    * entry overhead. Feeds the byte-sized [[ForcedBroadcast]] guard
    * (ADVICE r17 flagged the unguarded broadcast; ADVICE r18 flagged
    * the row-count proxy that replaced it — the guard now prices the
    * broadcast against the actual driver heap).
    */
  private val FrontierRowBytes = 64L

  /** Coarse value-range buckets for the distributed running-min scan of
    * the UNGROUPED frontier — the [[DataProfile]] cdf convention: the
    * only zero-partition window left runs over the ≤`SkylineCoarse`-row
    * bucket aggregate, bounded by this constant, never by the data.
    */
  private val SkylineCoarse = 256

  /** Cheap-path dispatch bound (r18 verdict task 6): when the whole
    * distinct-(group, x) aggregate holds at most this many rows, the
    * coarse-bucket machinery is pure overhead (a measured 3× at bench
    * scale) and the plain per-group window — one sort of ≤ this many
    * rows — is the right plan. 10 k rows is sub-millisecond window
    * material; the continuous-x / hot-group regimes the distributed
    * scan exists for sit orders of magnitude above it.
    */
  private val SkylineSmallMaxRows = 10000L

  /** GROUP-WISE 2D skyline: an independent pareto frontier per group
    * (frontier-per-brand, frontier-per-supplier — the window
    * partitions by the group, so one hot group costs a sort of ITS
    * x-cardinality, never a global one). [[skyline2D]] is this with no
    * group; its UNGROUPED frontier scan is DISTRIBUTED (r17 verdict
    * task 3): a single-partition window over distinct x dies the
    * moment x is a price or timestamp, so the running mins ride the
    * [[DataProfile.quantilesExact]] pattern instead — coarse
    * value-range buckets, per-bucket local running mins, broadcast
    * cross-bucket prefix mins (the one remaining global window is over
    * the ≤[[SkylineCoarse]]-row bucket aggregate). Non-numeric x falls
    * back to the single-partition window with a loud stderr contract
    * warning (same posture as capBuckets). A distinct-(group, x)
    * aggregate at or below [[SkylineSmallMaxRows]] rows dispatches to
    * the same plain window ([[windowMins]]) WITHOUT the warning — at
    * that size the window is the right plan and the bucket machinery
    * was a measured 3× overhead (r18 verdict task 6).
    *
    * NULL semantics = the NOT-EXISTS oracle's (ADVICE r17): a row with
    * NULL in x, y or any group key has no dominator (NULL comparisons
    * never hold) and dominates nothing — it passes through to the
    * output untouched instead of being silently dropped by the
    * aggregates/joins below.
    */
  def skyline2DBy(df: DataFrame, groupCols: Seq[String], xCol: String,
                  yCol: String): DataFrame = {
    val keys = groupCols :+ xCol
    val anyNull = (keys :+ yCol).map(col(_).isNull).reduce(_ || _)
    val passThrough = df.filter(anyNull)
    val nn = df.filter(!anyNull)
    // localCheckpoint (same SkylineIngest caveat as fronts below): the
    // materialized count is the dispatch signal, and the large path
    // consumes the aggregate twice (offsets + windowed join-back), so
    // the cut also stops a double evaluation of the corpus shuffle
    val perX = nn.groupBy(keys.map(col): _*)
      .agg(min(col(yCol)).as("__miny"))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // cheap-path dispatch (r18 verdict task 6): the distributed frontier
    // scan exists for continuous x and hot groups; when the WHOLE
    // distinct-(group, x) aggregate is tiny, the per-group window is
    // the right plan — same rows out, none of the bucket stages. The
    // small face also skips the fronts checkpoint and its broadcast
    // guard count below: a ≤10k-row window over the already-checkpointed
    // perX is trivially recomputable and always broadcast-sized, and
    // each skipped action is a whole scheduled job on the micro-scale
    // queries this path exists for.
    val frontSide: DataFrame =
      if (perX.count() <= SkylineSmallMaxRows) {
        val small = windowMins(perX, groupCols, xCol)
          .select((keys.map(col) :+ col("__rm_le") :+ col("__rm_lt")): _*)
        // grouped keys can be arbitrarily wide — leave those to AQE's
        // byte-based runtime broadcast decision, as on the large path
        if (groupCols.isEmpty) broadcast(small) else small
      } else {
        // localCheckpoint, NOT persist: skyline2D runs per micro-batch in
        // SkylineIngest, and a persist here would pile an un-unpersistable
        // CacheManager entry onto every batch; checkpoint blocks are
        // reclaimed by the ContextCleaner once the plan is dropped
        val fronts = runningMins(perX, groupCols, xCol)
          .select((keys.map(col) :+ col("__rm_le") :+ col("__rm_lt")): _*)
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // forced broadcast only on the UNGROUPED face, where a frontier
        // row is exactly (x, 2 mins) and the row guard sizes it honestly;
        // the grouped frontier also carries arbitrary-width group keys,
        // so its join-back is left to AQE's BYTE-based runtime decision
        // (ADVICE r17's driver-OOM concern, kept closed under grouping)
        if (groupCols.nonEmpty) fronts
        else ForcedBroadcast.orShuffle(fronts, fronts.count(),
          FrontierRowBytes, "skyline2DBy ungrouped frontier")
      }
    nn.join(frontSide, keys)
      .filter(col(yCol) <= col("__rm_le") &&
        (col("__rm_lt").isNull || col(yCol) < col("__rm_lt")))
      .drop("__rm_le", "__rm_lt")
      .unionByName(passThrough)
  }

  /** Distributed running mins over the distinct-(group, x) aggregate
    * `perX` (columns: groupCols..., xCol, __miny): adds `__rm_le` (min
    * __miny over x' ≤ x within the group) and `__rm_lt` (over x' < x,
    * NULL when nothing is smaller) without ever sorting one group's
    * full x-cardinality in one task — the r18 extension of the r17
    * verdict's ungrouped fix to HOT GROUPS (one brand holding half the
    * catalog is the grouped twin of the continuous-x hazard). Shape:
    * coarse GLOBAL value-range buckets (monotone in x by construction,
    * so bucket order aligns with x order — deterministic, unlike a
    * sampled range partitioning), per-(group, bucket) windows for the
    * local running mins, and a (groups × ≤[[SkylineCoarse]])-row
    * exclusive-prefix-min relation for the cross-bucket carry
    * (broadcast when ungrouped; plain equi-join when grouped — the
    * offsets relation scales with group count, AQE broadcasts the
    * small case). Value-range buckets inherit the cdf caveat: a
    * pathologically concentrated x puts most rows in one bucket (one
    * big — but single — sort task per group). Non-numeric x falls back
    * to the per-group window (loud when ungrouped — there the window
    * is single-partition; per-group sorts are the documented
    * low-cardinality contract).
    */
  /** Per-group window running mins over the distinct-(group, x)
    * aggregate — the cheap face of [[runningMins]]. Correct at any
    * cardinality but single-partition when ungrouped, so it is
    * dispatched only below [[SkylineSmallMaxRows]] (or as the loud
    * non-numeric-x fallback, where no value-range bucketing exists).
    */
  private def windowMins(perX: DataFrame, groupCols: Seq[String],
                         xCol: String): DataFrame = {
    val gs = groupCols.map(col)
    val wLe = Window.partitionBy(gs: _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLt = Window.partitionBy(gs: _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    perX
      .withColumn("__rm_le", min(col("__miny")).over(wLe))
      .withColumn("__rm_lt", min(col("__miny")).over(wLt))
  }

  private[graft] def runningMins(perX: DataFrame, groupCols: Seq[String],
                          xCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val gs = groupCols.map(col)
    val xd: Option[org.apache.spark.sql.Column] =
      perX.schema(xCol).dataType match {
      case _: NumericType => Some(col(xCol).cast("double"))
      case TimestampType | TimestampNTZType =>
        Some(col(xCol).cast("double"))
      case DateType => Some(col(xCol).cast("timestamp").cast("double"))
      case other =>
        if (groupCols.isEmpty)
          System.err.println(s"[graft] skyline2D: x column '$xCol' has " +
            s"non-numeric type $other — distributed frontier scan needs " +
            "a numeric/temporal x; falling back to the single-partition " +
            "window over distinct x (fine for low-cardinality x only)")
        None
    }
    xd match {
      case None => windowMins(perX, groupCols, xCol)
      case Some(x) =>
        val bounds = perX.agg(min(x).as("__lo"), max(x).as("__hi"))
        // floor of the monotone double image of x: x1 < x2 can only
        // give cb1 <= cb2, which is all the cross-bucket carry needs;
        // ties and boundary collapses are harmless (the within-bucket
        // window orders by the true x). Bounds are GLOBAL even when
        // grouped — per-group bounds would need a groups-sized join
        // here for no correctness gain (empty (group, bucket) cells
        // simply don't appear downstream).
        val withCb = perX.crossJoin(broadcast(bounds))
          .withColumn("__cb",
            when(col("__hi") > col("__lo"),
              greatest(lit(0), least(lit(SkylineCoarse - 1),
                floor((x - col("__lo")) /
                  ((col("__hi") - col("__lo")) / SkylineCoarse.toDouble)))))
              .otherwise(lit(0)).cast("int"))
          .drop("__lo", "__hi")
        // exclusive prefix min per (group, bucket): <= SkylineCoarse
        // rows per group — the prefix window is bounded by the
        // constant, not the data
        val offsets = withCb
          .groupBy((gs :+ col("__cb").as("__ob")): _*)
          .agg(min(col("__miny")).as("__bm"))
          .withColumn("__pre", min(col("__bm")).over(
            Window.partitionBy(gs: _*).orderBy(col("__ob"))
              .rowsBetween(Window.unboundedPreceding, -1)))
          .select((gs :+ col("__ob") :+ col("__pre")): _*)
        // disambiguate the group columns for the join-back
        val offs = groupCols.foldLeft(offsets)((d, g) =>
          d.withColumnRenamed(g, s"__og_$g"))
        val offSide = if (groupCols.isEmpty) broadcast(offs) else offs
        val joinCond = groupCols.foldLeft(col("__cb") === col("__ob")) {
          (acc, g) => acc && col(g) === col(s"__og_$g")
        }
        val wLe = Window.partitionBy((gs :+ col("__cb")): _*)
          .orderBy(col(xCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wLt = Window.partitionBy((gs :+ col("__cb")): _*)
          .orderBy(col(xCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        // least() skips NULLs: rm_le's window leg is never NULL (the
        // frame includes the current row); rm_lt is NULL only when both
        // the strict local window and the bucket prefix are empty —
        // exactly "nothing at strictly smaller x", as the filter expects
        withCb.join(offSide, joinCond)
          .drop((groupCols.map(g => s"__og_$g") :+ "__ob"): _*)
          .withColumn("__rm_le",
            least(min(col("__miny")).over(wLe), col("__pre")))
          .withColumn("__rm_lt",
            least(min(col("__miny")).over(wLt), col("__pre")))
    }
  }
}
