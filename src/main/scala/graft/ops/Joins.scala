package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark's API lacks as primitives — as-of join and range
  * join — composed from existing operators (the brief's preference (a):
  * compose before custom plans), in the shapes that survive 100 TB.
  * The DuckDB oracles cross-validate against that engine's NATIVE
  * `ASOF JOIN` and inequality-join implementations.
  */
object Joins {

  /** As-of (backward) join: for every left row, the single right row with
    * the greatest `tsCol` <= the left row's `tsCol`, per `keyCol`.
    *
    * Implementation is the union-and-carry pattern: tag both inputs, sort
    * per key by (ts, right-first on ties), and carry the last right value
    * forward with `last(ignoreNulls)`. ONE shuffle on the key and ONE
    * per-partition sort — no range condition ever reaches a join operator,
    * so there is no O(n*m) nested-loop anywhere. (A naive theta join
    * `l.ts >= r.ts` is a BroadcastNestedLoopJoin — quadratic.)
    *
    * Returns the left rows plus `asof_<rightTs>` (null when no prior
    * right row exists).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, rightTsOut: String): DataFrame = {
    val l = left.withColumn("__is_right", lit(0))
      .withColumn("__rts", lit(null).cast(left.schema(tsCol).dataType))
    val r = right.select(col(keyCol), col(tsCol)).withColumn("__is_right", lit(1))
      .withColumn("__rts", col(tsCol))
    val leftCols = left.columns
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts (asof is inclusive)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(rightTsOut, last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.toIndexedSeq.map(col) :+ col(rightTsOut): _*)
  }

  /** [[asofBackward]] carrying the matched right row's VALUE columns —
    * the full pandas `merge_asof` / kdb aj contract (a trade wants the
    * prior quote's PRICE, not just its time). Same union-and-carry
    * plan: the right row's carried columns travel as ONE struct through
    * the same single shuffle + per-partition sort; `last(ignoreNulls)`
    * carries the whole struct, which then unpacks to `<prefix><col>`
    * output columns (null when no prior right row exists). Right rows
    * tied on (key, ts) are resolved deterministically by the struct
    * ordering (largest carried tuple wins) — pandas keeps an arbitrary
    * occurrence; this face is at least reproducible.
    */
  def asofBackwardValues(left: DataFrame, right: DataFrame, keyCol: String,
                         tsCol: String, valueCols: Seq[String],
                         prefix: String = "asof_"): DataFrame = {
    val carried = tsCol +: valueCols
    val rvType = org.apache.spark.sql.types.StructType(
      carried.map(c => right.schema(c)))
    val leftCols = left.columns
    val l = left.withColumn("__is_right", lit(0))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = right.select(col(keyCol) +: carried.map(col): _*)
      .withColumn("__is_right", lit(1))
      .withColumn("__rv", struct(carried.map(col): _*))
      .select(col(keyCol), col(tsCol), col("__is_right"), col("__rv"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__is_right").desc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.toIndexedSeq.map(col) ++
        carried.map(c => col("__m").getField(c).as(s"$prefix$c")): _*)
  }

  /** [[asofBackward]] with a STALENESS TOLERANCE — the
    * pandas `merge_asof(tolerance=...)` / kdb window-join contract: a
    * prior right row OLDER than `toleranceMinutes` at the left row's
    * time is treated as NO match (nulled), because a quote from last
    * week must not price today's trade. A pure post-projection on the
    * as-of output — the one-shuffle union-and-carry plan is unchanged.
    */
  def asofBackwardTolerance(left: DataFrame, right: DataFrame,
                            keyCol: String, tsCol: String,
                            rightTsOut: String,
                            toleranceMinutes: Int): DataFrame =
    asofBackward(left, right, keyCol, tsCol, rightTsOut)
      .withColumn(rightTsOut,
        when(col(rightTsOut) >=
            col(tsCol) - expr(s"INTERVAL $toleranceMinutes MINUTES"),
          col(rightTsOut)).otherwise(lit(null).cast("timestamp")))

  /** As-of (forward) join — [[asofBackward]]'s mirror: for every left
    * row, the single right row with the SMALLEST `tsCol` >= the left
    * row's `tsCol`, per `keyCol` (the "time to next event" primitive:
    * next click after each purchase, next deploy after each alert).
    * Same union-and-carry shape — ONE shuffle, ONE per-partition sort,
    * no nested loop: at equal ts the right row sorts after the left row
    * and the forward-looking frame `[current, unbounded following)`
    * still sees it (forward as-of is inclusive). Returns the left rows
    * plus `rightTsOut` (null when no later right row exists).
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, rightTsOut: String): DataFrame = {
    val l = left.withColumn("__is_right", lit(0))
      .withColumn("__rts", lit(null).cast(left.schema(tsCol).dataType))
    val r = right.select(col(keyCol), col(tsCol)).withColumn("__is_right", lit(1))
      .withColumn("__rts", col(tsCol))
    val leftCols = left.columns
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__is_right").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn(rightTsOut, first(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.toIndexedSeq.map(col) :+ col(rightTsOut): _*)
  }

  /** Nearest-neighbor as-of — pandas `merge_asof(direction='nearest')`:
    * for every left row, whichever of its backward and forward matches
    * is CLOSER in time (ties break backward, the pandas rule). Composed
    * from the two union-and-carry passes over the same key partitioning
    * — two window sorts, still no nested loop anywhere.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, rightTsOut: String): DataFrame = {
    val both = asofForward(
      asofBackward(left, right, keyCol, tsCol, "__back"),
      right, keyCol, tsCol, "__fwd")
    // micros, not cast-to-long (which truncates to SECONDS and would
    // mis-break sub-second nearest decisions)
    val db = unix_micros(col(tsCol).cast("timestamp")) -
      unix_micros(col("__back").cast("timestamp"))
    val df_ = unix_micros(col("__fwd").cast("timestamp")) -
      unix_micros(col(tsCol).cast("timestamp"))
    both.withColumn(rightTsOut,
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(df_ < db, col("__fwd"))
          .otherwise(col("__back"))) // ties and db <= df: backward
      .drop("__back", "__fwd")
  }

  /** Range join: pair every left row whose `tsCol` falls in a right-side
    * interval `[startCol, endCol)`, via bucketization: both sides map to a
    * time-bucket grid of `bucketMillis` (intervals explode into the 1+
    * buckets they overlap), the join is an EQUI join on (bucket), and the
    * range predicate filters the small per-bucket candidate set. Shuffle
    * is hash(bucket) — never a nested loop over the cross product.
    *
    * `bucketMillis` should be >= the maximum interval length (each
    * interval then covers <= 2 buckets).
    */
  def rangeJoin(left: DataFrame, leftTs: String,
                right: DataFrame, startCol: String, endCol: String,
                bucketMillis: Long): DataFrame = {
    // Bucket via unix_micros over an explicit cast-to-timestamp: robust to
    // TIMESTAMP, TIMESTAMP_NTZ and string arrivals alike (a direct
    // cast-to-double fails analysis on NTZ). Both sides bucket through the
    // same cast, so the grid stays consistent regardless of session TZ.
    def bucketOf(c: Column): Column =
      floor(unix_micros(c.cast("timestamp")) / (bucketMillis * 1000.0)).cast("long")
    val l = left.withColumn("__bucket", bucketOf(col(leftTs)))
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    l.join(r, Seq("__bucket"))
      .filter(col(leftTs) >= col(startCol) && col(leftTs) < col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: every (left, right) pair whose half-open
    * integer intervals `[ls, le)` and `[rs, re)` intersect — the
    * interval×interval companion of the point-in-interval [[rangeJoin]]
    * (campaign windows vs shipping windows, downtime vs sessions). Same
    * grid strategy: both sides explode into the `bucketWidth` cells they
    * touch, the join is an EQUI join on the cell, a pair overlapping
    * several cells dedups, and the exact predicate `ls < re && rs < le`
    * filters the per-cell candidates — no range condition ever reaches a
    * join operator.
    *
    * Scale posture: cells per interval = len/bucketWidth + 1 (pick the
    * width near the typical interval length); per-cell candidate volume
    * equals the number of intervals ALIVE in that window, which is also
    * a lower bound on the true output — overlap joins are output-bound
    * by nature, the grid just stops them from being input-quadratic.
    * Returns both ids, both bounds, and the intersection
    * `[overlap_start, overlap_end)`.
    *
    * Giant-interval guard (ADVICE r16): an interval spanning more than
    * `maxCellsPerInterval` grid cells would make `explode(sequence(...))`
    * blow the per-row array budget (or, past ~2^31 cells, fail Spark's
    * array-length cap) with no diagnostic. Such intervals are split OUT
    * of the grid legs and handled by a BROADCAST overlap leg instead:
    * a giant interval is by definition ≫ bucketWidth long, so giants are
    * rare (their count is bounded by total-span / (max·width)); each one
    * overlaps a large fraction of the other side anyway, so the
    * broadcast theta-leg is output-bound, not a disguised cross product.
    * The split is decided by ONE counting action; when no giants exist
    * (the common case, and any sane width choice) the plan is the pure
    * grid equi-join. Giants are reported loudly on stderr (the
    * capBuckets convention), and a giant count past `MaxGiantIntervals`
    * fails fast with sizing guidance rather than OOM-ing the driver's
    * broadcast.
    */
  private val MaxGiantIntervals = 1000000L

  def intervalOverlapJoin(left: DataFrame, leftId: String,
                          ls: String, le: String,
                          right: DataFrame, rightId: String,
                          rs: String, re: String,
                          bucketWidth: Long,
                          maxCellsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxCellsPerInterval > 0,
      s"maxCellsPerInterval must be positive: $maxCellsPerInterval")
    def norm(d: DataFrame, id: String, s: String, e: String,
             tagId: String, tagS: String, tagE: String): DataFrame =
      d.select(col(id).as(tagId), col(s).cast("long").as(tagS),
          col(e).cast("long").as(tagE))
        .filter(col(tagS) < col(tagE)) // empty intervals overlap nothing
    def nCells(tagS: String, tagE: String): Column =
      floor((col(tagE) - 1) / bucketWidth).cast("long") -
        floor(col(tagS) / bucketWidth).cast("long") + 1
    def cells(d: DataFrame, tagS: String, tagE: String): DataFrame =
      d.withColumn("__cell", explode(sequence(
        floor(col(tagS) / bucketWidth).cast("long"),
        floor((col(tagE) - 1) / bucketWidth).cast("long"))))
    val l = norm(left, leftId, ls, le, leftId, "__ls", "__le")
    val r = norm(right, rightId, rs, re, rightId, "__rs", "__re")
    val lGiant = l.filter(nCells("__ls", "__le") > maxCellsPerInterval)
    val rGiant = r.filter(nCells("__rs", "__re") > maxCellsPerInterval)
    // one action decides the shape: [left giants, right giants]
    val giants = lGiant.select(count(lit(1)).as("n"))
      .unionAll(rGiant.select(count(lit(1)).as("n")))
      .collect().map(_.getLong(0))
    val overlapPred =
      col("__ls") < col("__re") && col("__rs") < col("__le")
    val out = Seq(col(leftId), col(rightId),
      col("__ls").as(ls), col("__le").as(le),
      col("__rs").as(rs), col("__re").as(re))
    val grid = cells(
        l.filter(nCells("__ls", "__le") <= maxCellsPerInterval),
        "__ls", "__le")
      .join(cells(
          r.filter(nCells("__rs", "__re") <= maxCellsPerInterval),
          "__rs", "__re"),
        Seq("__cell"))
      .filter(overlapPred)
      .select(out: _*)
      .distinct()
    val paired =
      if (giants.sum == 0) grid
      else {
        require(giants.sum <= MaxGiantIntervals,
          s"intervalOverlapJoin: ${giants.sum} intervals span more than " +
            s"$maxCellsPerInterval x $bucketWidth — pick a larger " +
            "bucketWidth (or raise maxCellsPerInterval) instead of " +
            "broadcasting millions of giant intervals")
        System.err.println(s"[graft] intervalOverlapJoin: ${giants(0)} " +
          s"left / ${giants(1)} right interval(s) span > " +
          s"$maxCellsPerInterval cells of width $bucketWidth; served " +
          "via the broadcast overlap leg — pick a bucketWidth near the " +
          "typical interval length to keep everything on the grid")
        // giant-left x ALL right, normal-left x giant-right: disjoint
        // classes, full coverage, no double count
        // each leg gets the same .distinct() the grid leg applies
        // (ADVICE r17): duplicate input rows (same id and bounds) must
        // collapse identically whether the interval takes the grid or
        // the giant path. The legs are disjoint classes, so per-leg
        // distinct equals distinct over the union.
        val gl = broadcast(lGiant).join(r, overlapPred).select(out: _*)
          .distinct()
        val gr = l.filter(nCells("__ls", "__le") <= maxCellsPerInterval)
          .join(broadcast(rGiant), overlapPred).select(out: _*)
          .distinct()
        grid.unionByName(gl).unionByName(gr)
      }
    paired
      .withColumn("overlap_start", greatest(col(ls), col(rs)))
      .withColumn("overlap_end", least(col(le), col(re)))
  }

  /** OUTER counting face of [[rangeJoin]]: every right interval with the
    * number of in-range left rows — INCLUDING zero (the audit a
    * monitoring pipeline wants: "errors with NO click in their window"
    * must surface, not vanish from an inner join). Composition stays
    * nested-loop-free: the inner bucketized join produces the hits, a
    * hit-sized aggregate counts per `rightId`, and the interval relation
    * left-joins the counts (interval-count-sized, broadcastable).
    */
  def rangeCount(left: DataFrame, leftTs: String,
                 right: DataFrame, rightId: String,
                 startCol: String, endCol: String,
                 bucketMillis: Long): DataFrame = {
    val hits = rangeJoin(left.select(col(leftTs)), leftTs,
        right.select(col(rightId), col(startCol), col(endCol)),
        startCol, endCol, bucketMillis)
      .groupBy(col(rightId)).agg(count(lit(1)).as("n_hits"))
    right.join(broadcast(hits), Seq(rightId), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
  }

  /** Bloom-pruned semi join: `big`'s rows whose `bigKey` appears in
    * `small`'s `smallKey` — an explicit runtime-filter operator for the
    * regime where the small side is too large to broadcast but its KEY
    * SET compresses into a few hundred KB of bits.
    *
    * Why it exists: a plain shuffle semi join moves the ENTIRE big side
    * through the exchange to discover that most rows match nothing. The
    * bloom prefilter (built by a fixed-state `treeAggregate`, probed as
    * codegen'd bit tests INSIDE the big side's scan stage — see
    * [[Bloom]]) kills non-members before they ever reach the shuffle;
    * only (matches + false positives) rows move. The exact semi join
    * over the survivors then removes the false positives, so the result
    * equals the plain semi join BIT FOR BIT — the bloom changes the
    * data volume, never the answer (the `decontaminateBloom` contract,
    * generalized to any key join).
    *
    * The filter auto-sizes at ~`bitsPerKey` bits per distinct small key
    * (rounded up to a power of two; ~1% false positives at 10), priced
    * by one count over the small side's key set — the same honest
    * auto-sizing `decontaminateBloom` uses.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    bitsPerKey: Int = 10, numHashes: Int = 5): DataFrame = {
    val (keys, f) = smallSideFilter(big, small, smallKey, bitsPerKey,
      numHashes)
    big.filter(Bloom.mightContain(f, col(bigKey).cast("string")))
      .join(keys.select(col("__k").as("__sk")),
        col(bigKey).cast("string") === col("__sk"), "left_semi")
  }

  /** The ANTI dual of [[bloomSemiJoin]]: `big`'s rows whose `bigKey`
    * does NOT appear in `small` — and here the bloom is even stronger,
    * because a MISS is a proof: a row the filter rejects is definitely
    * not a member and is emitted DIRECTLY, without ever touching a
    * shuffle. Only the maybe-members (matches + false positives — a
    * sliver of the big side when the anti join is selective the usual
    * way) go through the exact anti join that disposes of the false
    * positives. Result equals the plain left-anti join bit-for-bit.
    *
    * Null big-side keys follow Spark's left_anti NULL rule: a null key
    * never equals anything, so the row is KEPT (the filter branch
    * routes nulls to the definite-keep side explicitly — `mightContain`
    * on null is null, not false, and a null-valued predicate would
    * silently drop them).
    */
  def bloomAntiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    bitsPerKey: Int = 10, numHashes: Int = 5): DataFrame = {
    val (keys, f) = smallSideFilter(big, small, smallKey, bitsPerKey,
      numHashes)
    val maybe = Bloom.mightContain(f, col(bigKey).cast("string"))
    val definiteOut = big.filter(col(bigKey).isNull || !maybe)
    val candidates = big.filter(col(bigKey).isNotNull && maybe)
      .join(keys.select(col("__k").as("__sk")),
        col(bigKey).cast("string") === col("__sk"), "left_anti")
    definiteOut.unionByName(candidates)
  }

  private def smallSideFilter(big: DataFrame, small: DataFrame,
      smallKey: String, bitsPerKey: Int,
      numHashes: Int): (DataFrame, Bloom.Filter) = {
    val keys = small.select(col(smallKey).cast("string").as("__k"))
      .filter(col("__k").isNotNull).distinct()
    val nKeys = math.max(1L, keys.count())
    var bits = 1 << 16
    while (bits.toLong < nKeys * bitsPerKey && bits < (1 << 28)) bits <<= 1
    (keys, Bloom.build(keys, col("__k"), bits, numHashes))
  }
}
