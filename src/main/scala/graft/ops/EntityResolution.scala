package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT edit-distance similarity join — the entity-resolution /
  * record-linkage face of dedup: find every pair of strings within
  * Levenshtein distance `d`, without ever materializing the cross
  * product.
  *
  * Algorithm: partition-based segment blocking (the PassJoin family —
  * Li, Deng, Wang, Feng, "PassJoin: A Partition-based Method for
  * Similarity Joins", PVLDB 2011 — implemented from scratch on Spark
  * relational primitives). The pigeonhole argument: split an indexed
  * string of length `l` into `d+1` contiguous segments; any string
  * within edit distance `d` of it must contain AT LEAST ONE of those
  * segments verbatim, starting within `d` positions of the segment's
  * home offset (each edit operation shifts downstream characters by at
  * most one, and at most `d` edits touch the whole string, so some
  * segment is untouched AND un-shifted beyond `d`). Blocking on
  * (segment text, segment index, indexed length) therefore has ZERO
  * false negatives; a final `levenshtein(...) <= d` filter removes the
  * false positives, so the result is EXACTLY the cross-product
  * semantics — this is an exact operator with a sub-quadratic plan, not
  * an approximation.
  *
  * Scale posture: both sides reduce to short (segment, i, l) keys — the
  * join is a plain hash equi-join on those keys (PlanSpec pins
  * no-cartesian / no-nested-loop); candidates, not the corpus, pay the
  * verification cost. The degenerate case is a FLOOD SEGMENT — a shared
  * constant prefix (every id starting "Customer#") puts one segment of
  * every row in one bucket and the candidate join goes quadratic
  * exactly like an LSH hot bucket. `maxBucketSize > 0` arms the same
  * loud drop used by [[Dedup.capBucketsPaired]] — and, exactly as
  * there, a drop trades RECALL, not precision: a pair whose only
  * untouched segment IS the flood segment (e.g. d=1 with the edit in
  * the diverse half) loses its one blocking key and goes unreported,
  * while every surviving pair is still levenshtein-verified. Keep the
  * cap disarmed unless a flood is demonstrated; the loud stderr report
  * names the dropped buckets so the trade is visible.
  */
object EntityResolution {

  private val SegSchema = "array<struct<l:int,i:int,seg:string>>"

  /** Segment start offset (0-based) of segment `i` for a string of
    * length `l` split into `k` even segments: floor(i*l/k). Integer
    * arithmetic via floor(double) is exact for every l, i this ever
    * sees (l < 2^26).
    */
  private def segStart(i: Column, l: Column, k: Int): Column =
    floor(i * l / lit(k)).cast("int")

  /** Index-side blocking keys: one row per (id, str, l, i, seg) — the
    * d+1 home segments of each string.
    */
  private[graft] def segmentKeys(df: DataFrame, idCol: String,
                                 strCol: String, d: Int): DataFrame = {
    val k = d + 1
    val l = length(col(strCol))
    val segs = transform(sequence(lit(0), lit(d)), i => {
      val p = segStart(i, l, k)
      val len = segStart(i + 1, l, k) - p
      struct(l.as("l"), i.cast("int").as("i"),
        col(strCol).substr(p + 1, len).as("seg"))
    })
    df.select(col(idCol).as("__rid"), col(strCol).as("__rstr"),
        explode(segs).as("__s"))
      .select(col("__rid"), col("__rstr"),
        col("__s.l").as("l"), col("__s.i").as("i"), col("__s.seg").as("seg"))
  }

  /** Probe-side blocking keys: for each probe string of length `m`,
    * every substring that could equal an indexed segment — for each
    * candidate indexed length `l` in [m-d, m+d], each segment index
    * `i`, and each start within `d` of the segment's home offset. The
    * probe fan-out is O(d^2 * (2d+1)) substrings per row — constant in
    * corpus size.
    */
  private[graft] def probeKeys(df: DataFrame, idCol: String,
                               strCol: String, d: Int): DataFrame = {
    val k = d + 1
    val m = length(col(strCol))
    val subs = flatten(transform(
      sequence(greatest(m - d, lit(0)), m + d), l =>
        flatten(transform(sequence(lit(0), lit(d)), i => {
          val p = segStart(i, l, k)
          val len = segStart(i + 1, l, k) - p
          val lo = greatest(p - lit(d), lit(0))
          val hi = least(m - len, p + lit(d))
          when(hi >= lo,
            transform(sequence(lo, hi), j =>
              struct(l.cast("int").as("l"), i.cast("int").as("i"),
                col(strCol).substr(j + 1, len).as("seg"))))
            .otherwise(array().cast(SegSchema))
        }))))
    df.select(col(idCol).as("__pid"), col(strCol).as("__pstr"),
        explode(subs).as("__s"))
      .select(col("__pid"), col("__pstr"),
        col("__s.l").as("l"), col("__s.i").as("i"), col("__s.seg").as("seg"))
  }

  /** All (left, right) pairs with levenshtein(leftStr, rightStr) <= d —
    * EXACT cross-product semantics via segment blocking + verify.
    * Output: (leftId, rightId, dist), column names taken from the
    * id arguments.
    */
  def editDistanceJoin(left: DataFrame, leftId: String, leftStr: String,
                       right: DataFrame, rightId: String, rightStr: String,
                       d: Int, maxBucketSize: Int = 0): DataFrame = {
    require(d >= 1, s"edit-distance threshold must be >= 1, got $d")
    val probe = probeKeys(left, leftId, leftStr, d)
    val index = segmentKeys(right, rightId, rightStr, d)
    val (pc, ic) =
      Dedup.capBucketsPaired(probe, index, Seq("l", "i", "seg"),
        maxBucketSize, "editDistanceJoin")
    pc.join(ic, Seq("l", "i", "seg"))
      .select(col("__pid"), col("__pstr"), col("__rid"), col("__rstr"))
      .distinct()
      // thresholded levenshtein: banded O(d*n) DP with early abandon
      // (returns -1 past the threshold) — the verify call is the hot
      // loop on long strings, and the full O(n*m) matrix is wasted work
      .withColumn("dist", levenshtein(col("__pstr"), col("__rstr"), d))
      .filter(col("dist") >= 0)
      .select(col("__pid").as(leftId), col("__rid").as(rightId), col("dist"))
  }

  /** Self-join face: unordered pairs (idA < idB) within distance d. */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
                           d: Int, maxBucketSize: Int = 0): DataFrame = {
    require(d >= 1, s"edit-distance threshold must be >= 1, got $d")
    val probe = probeKeys(df, idCol, strCol, d)
    val index = segmentKeys(df, idCol, strCol, d)
    val (pc, ic) =
      Dedup.capBucketsPaired(probe, index, Seq("l", "i", "seg"),
        maxBucketSize, "editDistanceSelfJoin")
    pc.join(ic, Seq("l", "i", "seg"))
      .filter(col("__pid") < col("__rid"))
      .select(col("__pid"), col("__pstr"), col("__rid"), col("__rstr"))
      .distinct()
      .withColumn("dist", levenshtein(col("__pstr"), col("__rstr"), d))
      .filter(col("dist") >= 0)
      .select(col("__pid").as("id_a"), col("__rid").as("id_b"), col("dist"))
  }

  /** The index relation for [[editDistanceJoinIndexed]] — build once
    * over the reference corpus, persist/append, probe with every new
    * batch (the incremental-ingest shape shared with
    * [[Dedup.bandIndex]]): one row per (index_id, l, i, seg).
    */
  def indexSegments(df: DataFrame, idCol: String, strCol: String,
                    d: Int): DataFrame =
    segmentKeys(df, idCol, strCol, d)
      .select(col("__rid").as("index_id"), col("__rstr").as("index_str"),
        col("l"), col("i"), col("seg"))

  /** Probe a PRE-BUILT segment index with a new batch — per-ingest cost
    * is batch-fanout-sized plus the candidate join, independent of how
    * the index was accumulated. Output: (leftId, index_id, dist).
    */
  def editDistanceJoinIndexed(index: DataFrame, left: DataFrame,
                              leftId: String, leftStr: String, d: Int,
                              maxBucketSize: Int = 0): DataFrame = {
    require(d >= 1, s"edit-distance threshold must be >= 1, got $d")
    val probe = probeKeys(left, leftId, leftStr, d)
    val (pc, ic) = Dedup.capBucketsPaired(probe, index, Seq("l", "i", "seg"),
      maxBucketSize, "editDistanceJoinIndexed")
    pc.join(ic, Seq("l", "i", "seg"))
      .select(col("__pid"), col("__pstr"), col("index_id"), col("index_str"))
      .distinct()
      .withColumn("dist", levenshtein(col("__pstr"), col("index_str"), d))
      .filter(col("dist") >= 0)
      .select(col("__pid").as(leftId), col("index_id"), col("dist"))
  }

  /** Entity clusters: connected components over the distance-<=d pair
    * graph ([[Dedup.resolveClusters]] label propagation), every record
    * labeled with its component's minimum id — singletons keep their own
    * id. The canonical "which rows are the same real-world entity"
    * output.
    */
  def clusterIds(df: DataFrame, idCol: String, strCol: String, d: Int,
                 maxBucketSize: Int = 0): DataFrame = {
    val pairs = editDistanceSelfJoin(df, idCol, strCol, d, maxBucketSize)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val labels = Dedup.resolveClusters(pairs)
    df.select(col(idCol))
      .join(labels, df(idCol) === labels("node"), "left")
      .select(col(idCol),
        coalesce(col("label"), col(idCol)).as("cluster_id"))
  }

  /** Record-linkage resolution: for each left record, its BEST match on
    * the right (minimum distance, ties broken by minimum right id) —
    * one aggregation over [[editDistanceJoin]]'s pair relation, no
    * window sort. Left records with no match within `d` are absent
    * (the unlinked remainder is `left.join(result, "left_anti")`).
    */
  def linkBest(left: DataFrame, leftId: String, leftStr: String,
               right: DataFrame, rightId: String, rightStr: String,
               d: Int, maxBucketSize: Int = 0): DataFrame =
    editDistanceJoin(left, leftId, leftStr, right, rightId, rightStr,
        d, maxBucketSize)
      .groupBy(col(leftId))
      .agg(min(struct(col("dist"), col(rightId))).as("__best"))
      .select(col(leftId), col(s"__best.$rightId").as(rightId),
        col("__best.dist").as("dist"))
}
