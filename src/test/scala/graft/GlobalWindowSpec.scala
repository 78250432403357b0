package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window, WindowGroupLimit}

/** Whitelist pin for the UNPARTITIONED-window surface (VERDICT r20
  * task 4): a full Verify run logs ~142 `WindowExec: No Partition
  * Defined` warnings, all believed bounded (day-series, domain-sized
  * post-aggregates, per-bin collects) — but nothing enumerated them, so
  * a NEW unbounded global window would land silently among known-benign
  * warnings. This spec walks every declared query's OPTIMIZED logical
  * plan and pins the exact set of queries that contain a Window (or
  * WindowGroupLimit) with an empty partitionSpec:
  *
  *  - a query OUTSIDE the whitelist gaining a global window FAILS — the
  *    author must either partition it or justify adding it here, with
  *    the boundedness argument next to the name;
  *  - a whitelisted query LOSING its global window also fails (stale
  *    whitelist = the pin rots into "anything goes").
  *
  * The whitelist below was enumerated on the r21 tree at sf0.001 and
  * each entry's relation is bounded by construction — the categories:
  * day-series (≤ |days|), domain-sized post-aggregates (≤ |types| x
  * |locations|), per-bin/per-bucket collects after a bounding aggregate,
  * candidate-bound rank joins, and k-sized codebook/centroid relations.
  */
class GlobalWindowSpec extends SparkSpec {

  // run LAST-ish and serially: building all 326 plans triggers each
  // query's eager internal builds (persists, checkpoints, memo entries)
  private def globalWindowQueries(): Map[String, Int] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, sf0001)
      val n = df.queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimit if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) Some(name -> n) else None
    }.toMap

  /** The allowed set: every entry verified bounded on the r21 tree. */
  private val allowed: Set[String] = GlobalWindowSpec.allowed

  test("unpartitioned windows appear ONLY in the whitelisted queries, " +
      "and the whitelist is not stale") {
    val found = globalWindowQueries()
    val unexpected = found.keySet -- allowed
    assert(unexpected.isEmpty,
      s"NEW unpartitioned (global) window in: ${unexpected.toSeq.sorted}" +
        " — partition it, or add it to GlobalWindowSpec.allowed with a " +
        "boundedness argument")
    val stale = allowed -- found.keySet
    assert(stale.isEmpty,
      s"whitelisted queries no longer have a global window: " +
        s"${stale.toSeq.sorted} — remove them so the pin stays tight")
  }
}

object GlobalWindowSpec {
  /** Queries whose optimized plan carries >= 1 unpartitioned window,
    * each sitting on a provably bounded relation (enumerated r21 at
    * sf0.001; boundedness argument per category).
    */
  val allowed: Set[String] = Set(
    // day-series: window input <= |distinct days| (calendar-bounded)
    "events_dau_rolling", "events_cumulative_users",
    // domain-sized post-aggregates: input <= |event types| / |funnel
    // stages| / |(source, lang) slices| / |years| / |cells|
    "events_type_heavy_hitters", "events_funnel_report",
    "corpus_data_card", "vec_index_stats", "analytics_yoy_revenue",
    // Misra-Gries / KMV sketches: input is the k-sized merged sketch
    // (k <= 28), regardless of corpus size
    "events_key_heavy_hitters_flood", "corpus_token_heavy_hitters",
    "sketch_kmv_overlap",
    // exact-CDF coarse-bucket offset tables: the single-partition window
    // is the 64-row bucket inventory, never the data (DataProfile.cdf)
    "analytics_rfm", "profile_join_skew", "stats_quantiles",
    "stats_winsorized_mean", "stats_hist_depth",
    // bootstrap/AB resample summaries: input = 32 resample aggregates
    "stats_ab_diff_ci",
    // skyline fronts: window over the per-bin collected front, bounded
    // by the 1e-6-grid bin count (PlanSpec-pinned shapes)
    "analytics_skyline", "analytics_skyline_price",
    // mixture/sampler rate tables: input <= |buckets| x |rates|
    // (offsets/budgets broadcast back per the PlanSpec pins)
    "sample_temperature_rates", "sample_temperature_mix",
    "sample_epoch_rates", "sample_epoch_mix", "sample_token_budget",
    "sample_token_budget_bpe", "text_mixture_stats",
    "text_mixture_stats_bpe", "llm_corpus_prep_mix", "llm_curriculum",
    // funnel-stage count tables: input = |pipeline stages|
    "llm_dedup_funnel",
    // candidate/hit-sized top-k tails: ordering a query-count- or
    // hit-bounded relation after the pre-shuffle rank limit
    // (WindowGroupLimit pins in PlanSpec)
    "text_bm25_topk", "text_rrf_fusion", "text_pack_bins")
}
