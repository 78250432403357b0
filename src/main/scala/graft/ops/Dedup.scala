package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Document deduplication for large-scale training-data pipelines: exact
  * (hash-groupBy), MinHash + banded LSH (near-dup candidates without an
  * all-pairs join), exact n-gram Jaccard verification over the candidate
  * set, and 64-bit tf-weighted SimHash with pigeonhole banding.
  *
  * Scale posture (100 TB): the per-document sketches (shingles, MinHash
  * signature, band signatures) are pure projections — array expressions
  * inside one whole-stage-codegen map, no explode, no shuffle. The only
  * shuffles are (a) the groupBy on the band signature (rows are
  * (doc_id, band, sig) — tiny vs the corpus) and (b) the candidate-pair
  * verification join, whose left side is the candidate set, not the corpus.
  * Nothing here ever compares all pairs.
  *
  * Determinism: every hash is md5 over explicit UTF-8 strings (MinHash
  * derives its signature values from ONE md5 per gram via a literal-seed
  * universal-hash family — see [[MinhashSeeds]]), so results are
  * reproducible across engines (the DuckDB oracles in
  * [[graft.queries.LlmQueries]] replay the identical computation).
  *
  * Resource contract: the pair operators persist small sketch relations
  * (MEMORY_AND_DISK, deserialized: SQL-cache blocks are already compact
  * columnar CachedBatches — the r21 _SER experiment measured a 5x wall
  * regression on the containment family from the added per-read
  * serialization, see OPTIMIZATION_r21.md) to prevent recomputation
  * races across join sides.
  * They are NOT unpersisted here (the returned plans still reference
  * them); consume the result, then release with
  * `spark.catalog.clearCache()` — as Verify/Bench do per query.
  */
object Dedup {

  /** Exact dedup: group documents by a canonical content key
    * (md5 of lowercased text), keep the lowest id as the keeper.
    * One hash-aggregate; the shuffle carries one row per distinct content.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(lower(col(textCol))).as("text_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Materializing exact dedup: return the KEPT rows themselves (the
    * lowest-id representative of every content group) — what an ingestion
    * pipeline actually writes downstream. Shuffle carries (key, min_id)
    * pairs; the corpus is re-read once for the semi-join, never collected.
    */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = exact(df, idCol, textCol).select(col("keeper_id"))
    df.join(keepers, col(idCol) === col("keeper_id"), "left_semi")
  }

  /** Incremental exact dedup — the batch-vs-index face for the EXACT
    * family (mirroring [[incrementalLshCandidates]] for the sketch
    * families): drop batch rows whose content hash already exists in the
    * ingested corpus, then keep-first within the batch itself. What a
    * per-ingest pipeline runs before any fuzzy pass.
    *
    * Scale posture: the corpus side reduces to DISTINCT 16-byte content
    * hashes — corpus-sized, so NOT broadcast; the anti-join shuffles
    * both sides by hash (the correct shape: fixed-width keys, never the
    * text). In production the hash relation is a stored index appended
    * per ingest, exactly like the band indexes in
    * [[graft.streaming.NearDupIngest]].
    */
  def exactIncremental(batch: DataFrame, corpus: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val seen = corpus.select(md5(lower(col(textCol))).as("__h")).distinct()
    val fresh = batch.withColumn("__h", md5(lower(col(textCol))))
      .join(seen, Seq("__h"), "left_anti")
    // keep-first groups on the hash CARRIED through the anti-join instead
    // of calling exactKeepFirst (which would re-hash the batch text a
    // second time per plan reference)
    val keepers = fresh.groupBy(col("__h"))
      .agg(min(col(idCol)).as("keeper_id")).select(col("keeper_id"))
    fresh.join(keepers, col(idCol) === col("keeper_id"), "left_semi")
      .drop("__h")
  }

  /** Deterministic hash-based sampling: keep rows whose md5-derived bucket
    * (0-99) falls below `pct`. Unlike `sample()`/`sampleBy()` this is
    * reproducible across engines, runs, and partitionings — the
    * train/test-split primitive for dataset curation (split = complement
    * of the same predicate).
    */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** md5-derived bucket 0-99 from the first 8 hex digits of md5(id) —
    * 32 bits, so the mod-100 bias is ~2e-8 (4 digits would skew buckets
    * 0-35 by 1/655 relative). Public: the split primitive for
    * train/test/holdout carving and for [[incrementalLshCandidates]]'s
    * batch-vs-corpus fixtures.
    */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(id.cast(StringType)), 1, 8), 16, 10).cast("long") % 100)

  /** Deterministic stratified sample: the first `nPer` rows of every
    * `groupCol` stratum, ordered by md5(id) (id as tiebreak) — the
    * per-language / per-source quota primitive for corpus balancing.
    * Unlike `sampleBy` the result is engine- and run-reproducible.
    *
    * Scale posture: one shuffle on the stratum key; Spark plans the
    * rank-filter as WindowGroupLimit (per-partition partial top-n before
    * the exchange), so the shuffle carries at most nPer rows per
    * (stratum, input partition), not the corpus.
    */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       nPer: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast(StringType)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= nPer).drop("__rk")
  }

  /** Cluster-size histogram over a resolved near-dup labeling (the audit
    * a dedup run publishes: how many clusters of each size, i.e. how much
    * of the corpus is duplicated how heavily). Input is
    * [[resolveClusters]]'s (node, label) output; two tiny aggregations
    * over the candidate-sized relation.
    */
  def clusterStats(resolved: DataFrame): DataFrame =
    resolved.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** Deterministic per-group weighted sampling — the domain-mixture
    * primitive for training-data composition (e.g. upsample curated
    * sources, downsample raw crawl): keep a row when its md5 bucket falls
    * below the group's percentage; groups absent from `pctByGroup` get
    * rate 0. Same reproducibility contract as [[hashSample]] (stable
    * across engines, runs, and partitionings — re-running a mixture
    * yields the identical corpus), and map-only: the rate lookup is a
    * CASE chain, no join, no shuffle.
    */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     pctByGroup: Map[String, Int]): DataFrame = {
    val rate = pctByGroup.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (acc, (g, pct)) => when(col(groupCol) === g, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate)
  }

  /** EXACT-SIZE weighted sampling without replacement, per group —
    * Efraimidis-Spirakis priority sampling (the classic one-pass
    * algorithm): each row gets the key `u^(1/w)` with `u` an
    * md5-derived uniform in (0, 1] (no RNG — reruns and engines agree
    * bit-for-bit) and `w > 0` its weight; the top `n` keys per group
    * ARE a weighted sample without replacement. Complements
    * [[weightedSample]] (Bernoulli rates: expected size) when the
    * contract is "exactly n docs per slice, longer/better docs more
    * likely". Non-positive weights are excluded (a zero-weight row can
    * never be drawn).
    *
    * Shuffle shape: one map pass computes priorities, one group-keyed
    * window ranks them (WindowGroupLimit keeps n per partition
    * pre-shuffle). Priorities are rounded to the 1e-6 grid for the
    * cross-engine oracle compare (ties break on id, still a total
    * order); in production drop the rounding for full key resolution.
    */
  def weightedTopNSample(df: DataFrame, idCol: String, groupCol: String,
                         weightCol: String, n: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast(StringType)), 1, 15), 16, 10)
      .cast("double")
    val u = (h + lit(1.0)) / lit(math.pow(2, 60))
    val rn = row_number().over(Window.partitionBy(col(groupCol))
      .orderBy(col("sample_priority").desc, col(idCol)))
    df.filter(col(weightCol) > 0)
      .withColumn("sample_priority",
        round(pow(u, lit(1.0) / col(weightCol)), 6))
      .withColumn("__rn", rn).filter(col("__rn") <= n).drop("__rn")
  }

  /** [[weightedSample]] with the rates as a RELATION instead of a CASE
    * chain — the shape for mixtures over many groups (the chain is
    * O(groups) per row and bloats the plan past a few hundred arms,
    * where a broadcast hash lookup is O(1)). `rates` carries
    * (`groupCol`, `pct`); groups absent from it get rate 0 (inner join +
    * coalesce-free filter). Result is row-identical to the CASE face for
    * the same rate table (parity-spec'd).
    */
  def weightedSampleJoined(df: DataFrame, idCol: String, groupCol: String,
                           rates: DataFrame): DataFrame = {
    // collapse duplicate group rows (max wins, deterministically) — an
    // inner join against a rate table with repeated groups would
    // silently DUPLICATE corpus rows, the worst failure mode for a
    // sampling operator; the aggregate is rate-table-sized
    val r = rates.groupBy(col(groupCol)).agg(max(col("pct")).as("pct"))
    df.join(broadcast(r), Seq(groupCol))
      .filter(hashBucket(col(idCol)) < col("pct"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Temperature-scaled mixture rates — the multilingual-LM sampling
    * rule (sample domain g with share proportional to n_g^alpha, alpha in
    * (0, 1]): flattens the domain distribution so head domains stop
    * drowning the tail. Given per-group token masses n_g (sum of
    * `lenCol`) and a total token `budget`, the target kept mass is
    * budget * n_g^alpha / sum(n^alpha), and the emitted integer rate is
    *
    *   pct_g = least(100, floor(100 * budget * share_g / (tot * n_g)))
    *
    * with share_g = round(n_g^alpha, 6) and the quotient rounded to 6
    * places BEFORE the floor — both engines compute pow/sum in the last
    * float bits differently, and the 1e-6 grid (house convention) absorbs
    * that drift so the integer rates can never disagree. Feed the result
    * straight into [[weightedSampleJoined]] for the sampled corpus.
    *
    * Zero-mass groups (all-empty or all-NULL lengths) are EXCLUDED before
    * the rate arithmetic: 0^alpha / 0 is 0/0, and the engines disagree on
    * what floor(NaN) casts to (Spark emits 0, ANSI SQL errors) — a group
    * with no token mass has nothing to sample anyway, so dropping it is
    * the only answer both engines can agree on.
    *
    * Scale posture: ONE partial-aggregated corpus pass (group -> mass);
    * everything after is domain-count-sized (the share window runs on
    * tens of rows). No corpus-sized state, no second scan.
    */
  def temperatureMixRates(df: DataFrame, groupCol: String, lenCol: Column,
                          alpha: Double, budget: Long): DataFrame =
    mixRates(df, groupCol, lenCol, alpha, budget, capPct = 100)

  /** [[temperatureMixRates]] WITHOUT the single-epoch ceiling: a tail
    * domain whose temperature-target mass exceeds its actual mass gets
    * `pct > 100` — i.e. the mixture REPEATS it for multiple training
    * epochs, the standard multilingual/data-constrained recipe (tail
    * languages are up-sampled severalfold, head domains subsampled).
    * `maxEpochs` bounds the repeat (the "no more than N epochs"
    * guidance: past a few repeats, additional epochs of the same data
    * stop helping), so `pct` lands in [0, 100 * maxEpochs]. Feed the
    * result into [[weightedSampleWithEpochs]] to materialize the
    * repeated corpus.
    *
    * Scale posture: identical to [[temperatureMixRates]] — one
    * partial-aggregated corpus pass, then domain-count-sized arithmetic.
    */
  def temperatureMixEpochRates(df: DataFrame, groupCol: String,
                               lenCol: Column, alpha: Double, budget: Long,
                               maxEpochs: Int = 4): DataFrame =
    mixRates(df, groupCol, lenCol, alpha, budget, capPct = 100 * maxEpochs)

  private def mixRates(df: DataFrame, groupCol: String, lenCol: Column,
                       alpha: Double, budget: Long, capPct: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.select(col(groupCol), lenCol.as("n_tok"))
      .groupBy(col(groupCol))
      .agg(sum(col("n_tok")).cast("double").as("mass"))
      .filter(col("mass") > 0)
      .withColumn("share", round(pow(col("mass"), lit(alpha)), 6))
      .withColumn("pct", least(lit(capPct), floor(round(
        lit(100.0) * lit(budget.toDouble) * col("share") /
          (sum(col("share")).over(w) * col("mass")), 6))).cast("int"))
      .select(col(groupCol), col("mass").cast("long").as("n_tokens"),
        col("pct"))
  }

  /** Materialize a mixture whose rates may exceed 100: every document
    * keeps `floor(pct / 100)` full copies, plus one more iff its md5
    * bucket falls under `pct % 100` — the deterministic fractional
    * epoch (the same [[hashBucket]] rule as [[weightedSampleJoined]],
    * so a 1.3-epoch domain repeats ALL its documents once and a
    * reproducible 30% of them twice). Emits an `epoch` column (0-based
    * copy index) so downstream shard shuffling / sequence packing can
    * spread the copies instead of training them back-to-back.
    *
    * Scale posture: broadcast rate-table join + map-side
    * `explode(sequence)` — output grows only by the epoch factor; no
    * shuffle, no corpus-sized state. Duplicate rate rows collapse (max
    * wins) exactly as in [[weightedSampleJoined]].
    */
  def weightedSampleWithEpochs(df: DataFrame, idCol: String,
                               groupCol: String, rates: DataFrame): DataFrame = {
    val r = rates.groupBy(col(groupCol)).agg(max(col("pct")).as("pct"))
    df.join(broadcast(r), Seq(groupCol))
      .withColumn("n_copies",
        floor(col("pct") / 100).cast("int") +
          when(hashBucket(col(idCol)) < col("pct") % 100, 1).otherwise(0))
      .filter(col("n_copies") > 0)
      .select(df.columns.map(col).toIndexedSeq :+
        explode(sequence(lit(0), col("n_copies") - 1)).as("epoch"): _*)
  }

  /** Deterministic token-budget sample: take documents in a fixed
    * pseudo-random global order — (md5 bucket, md5(id), id) — until the
    * cumulative length of the PRECEDING documents reaches `budget` (so
    * the kept set is a reproducible prefix of a reproducible permutation;
    * the document that crosses the budget line is the last one kept).
    * The "sample exactly N tokens for this ablation" primitive.
    *
    * Scale posture: a global running sum is a single-partition window,
    * so it is computed as a distributed prefix-sum instead — per-bucket
    * totals (one partial-aggregated pass, 100 rows out) feed a
    * bucket-count-sized offset window, and the offsets broadcast back
    * into 100 INDEPENDENT per-bucket windows. No corpus-sized state ever
    * sits on one task; the result is row-identical to the naive global
    * window (the oracle states it that way).
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, lenCol: String,
                        budget: Long): DataFrame = {
    val withB = df.select(col(idCol), col(lenCol))
      .withColumn("__b", hashBucket(col(idCol)))
    val wOff = org.apache.spark.sql.expressions.Window.orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = withB.groupBy(col("__b"))
      .agg(sum(col(lenCol)).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    val wIn = org.apache.spark.sql.expressions.Window.partitionBy(col("__b"))
      .orderBy(md5(col(idCol).cast(StringType)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    withB.join(broadcast(offsets), "__b")
      .withColumn("cum_before",
        col("__off") + coalesce(sum(col(lenCol)).over(wIn), lit(0L)))
      .filter(col("cum_before") < budget)
      .select(col(idCol), col(lenCol), col("cum_before"))
  }

  /** Per-GROUP token-budget sampling — "take exactly N tokens from each
    * domain", the mixture-targeted form of [[tokenBudgetSample]]: every
    * group gets its own reproducible prefix of its own reproducible
    * permutation, cut at that group's budget. `budgets` carries
    * (`groupCol`, `budget`); duplicate group rows collapse (max wins,
    * deterministically — same contract as [[weightedSampleJoined]]);
    * groups absent from the table are dropped (inner join).
    *
    * Scale posture: the same distributed prefix-sum as the global face,
    * one level down — per-(group, bucket) totals feed a PER-GROUP offset
    * window (rows = groups x 100, domain-scale, broadcast back), and the
    * running sums run in groups x 100 INDEPENDENT windows. No group ever
    * sits on one task regardless of its size.
    */
  def tokenBudgetSampleBy(df: DataFrame, idCol: String, lenCol: String,
                          groupCol: String, budgets: DataFrame): DataFrame = {
    val b = budgets.groupBy(col(groupCol)).agg(max(col("budget")).as("budget"))
    val withB = df.select(col(groupCol), col(idCol), col(lenCol))
      .withColumn("__b", hashBucket(col(idCol)))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = withB.groupBy(col(groupCol), col("__b"))
      .agg(sum(col(lenCol)).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col(groupCol), col("__b"), col("__off"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__b"))
      .orderBy(md5(col(idCol).cast(StringType)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    withB.join(broadcast(offsets), Seq(groupCol, "__b"))
      .withColumn("cum_before",
        col("__off") + coalesce(sum(col(lenCol)).over(wIn), lit(0L)))
      .join(broadcast(b), Seq(groupCol))
      .filter(col("cum_before") < col("budget"))
      .select(col(groupCol), col(idCol), col(lenCol), col("cum_before"))
  }

  /** Distinct word k-gram shingles as an array column `shingles`
    * (map-only; empty array when the document has fewer than k tokens OR
    * the text is NULL — the NULL-text coalesce keeps the historical
    * empty-array contract even though the underlying native expression is
    * NULL-in/NULL-out, so consumers computing `size(shingles)` see 0, not
    * NULL). Built on the native codegen [[graft.functions.WordGrams]]
    * expression — the HOF formulation (`array_distinct(transform(...))`)
    * evaluated interpreted and was re-evaluated by
    * `InferFiltersFromGenerate` under every explode, which made shingling
    * the hot spot of the whole fuzzy pipeline (4 s of its 5 s at sf0.1).
    */
  def withShingles(df: DataFrame, textCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("shingles",
      coalesce(
        call_function("graft_word_grams", lower(col(textCol)), lit(k), lit(true)),
        typedLit(Seq.empty[String])))
  }

  /** Exploded distinct-shingle relation (doc_id, s) — the base for the
    * exact-Jaccard verification (set semantics, so distinct matters).
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    withShingles(df, textCol, k)
      .select(col(idCol).as("doc_id"), explode(col("shingles")).as("s"))

  /** MinHash signature as one aggregate pass: for seed j, mh_j = min over
    * shingles of md5(j || ':' || shingle), computed as `numHashes` min()
    * aggregates over the exploded shingle relation.
    *
    * Why this shape and not a per-row array expression: Spark's
    * higher-order functions (transform/array_min) evaluate interpreted,
    * and CollapseProject inlines the shingle array into every seed's
    * lambda — 16x recompute, per join side. The explode + partial-agg
    * formulation computes each md5 exactly once map-side and shuffles only
    * the (doc_id, 16 hashes) sketch.
    *
    * The shingle array here is deliberately NOT deduplicated and NOT
    * guarded by a CASE: min() is insensitive to duplicates, and the
    * cheaper generator expression matters because `InferFiltersFromGenerate`
    * re-evaluates it in a pushed-down filter. Documents with < k tokens
    * produce an empty sequence and simply drop out (same contract as the
    * oracle's `range()`).
    */
  /** Raw (non-distinct) exploded word-k-gram relation (doc_id, s) — the
    * shared generator for the MinHash sketch and corpus n-gram counting.
    * Fans out single-split scans ([[Par.fanOut]]); documents with < k
    * tokens yield an empty gram array and drop out of the explode (same
    * contract as the oracles' empty `range()`). Gram generation is the
    * native codegen [[graft.functions.WordGrams]] — see [[withShingles]].
    */
  private[ops] def rawGramRows(df: DataFrame, idCol: String,
                               textCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val in = Par.fanOut(df.select(col(idCol), col(textCol)))
    in.select(col(idCol).as("doc_id"),
      explode(call_function("graft_word_grams",
        lower(col(textCol)), lit(k), lit(false))).as("s"))
  }

  /** Universal-hash family for the MinHash signature: the gram is md5'd
    * ONCE, its first 15 hex digits (60 bits) become an integer `h`, and
    * signature value j is `(a_j * (h mod p) + b_j) mod p` over the
    * Mersenne prime p = 2^31 - 1. One string hash + numHashes integer
    * multiply-adds per gram — vs numHashes independent md5 evaluations,
    * which at 16 hashes made md5 the most expensive expression in the
    * whole suite.
    *
    * Seed independence matters: each (a_j, b_j) is derived from its own
    * md5 digest. An earlier revision used `a_j = (j+1)*A mod p`, which
    * makes `h_j(x) = (j+1) * (A*h + B) mod p` — every signature value a
    * scalar multiple of ONE hash, so the 16 "independent" minhashes were
    * heavily correlated, the 4 bands acted like one, and LSH recall on the
    * planted fixture dropped from 28/28 to 24/28. The seeds are plan-time
    * Scala constants spliced as literals into BOTH engines (the DuckDB
    * oracle's `VALUES` list), so parity is by construction.
    */
  val MinhashPrime: Long = 2147483647L
  val MinhashSeeds: IndexedSeq[(Long, Long)] = (0 until 64).map { j =>
    // first 15 hex digits (60 bits) of md5 over a per-seed tag
    def h60(tag: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag$j".getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    (h60("graft-minhash-a-") % (MinhashPrime - 1) + 1, // a in [1, p-1]
      h60("graft-minhash-b-") % MinhashPrime)          // b in [0, p-1]
  }

  /** 60-bit md5 prefix of `s` reduced mod [[MinhashPrime]] — the shared
    * per-gram hash every signature value derives from. 15 hex digits stay
    * inside signed-long range; a_j * hm < 2^62 keeps the multiply exact.
    */
  private def gramHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinhashPrime

  def minhashSketch(df: DataFrame, idCol: String, textCol: String,
                    k: Int, numHashes: Int): DataFrame = {
    def mhMin(j: Int) = {
      val (a, b) = MinhashSeeds(j)
      min((lit(a) * col("hm") + lit(b)) % MinhashPrime).as(s"mh$j")
    }
    rawGramRows(df, idCol, textCol, k)
      .withColumn("hm", gramHash(col("s")))
      .groupBy("doc_id")
      .agg(mhMin(0), (1 until numHashes).map(mhMin): _*)
  }

  /** Banded LSH candidate pairs: the signature is cut into `bands` bands
    * of numHashes/bands hashes; two documents are candidates iff some
    * band's signature (md5 of the comma-joined hashes) matches exactly.
    * Only (doc_id, band, sig) rows are shuffled for the bucket self-join;
    * the sketch aggregation underneath is one reused exchange, so the
    * corpus-side work runs once.
    */
  /** (doc_id, band, sig) LSH band relation — the unit that gets indexed,
    * self-joined ([[lshCandidatePairs]]) or joined against an existing
    * index ([[incrementalLshCandidates]]). Band signature = the
    * comma-joined hash values themselves (~40 chars for 4 ints) — hashing
    * them again would cost more than it saves.
    *
    * Public as [[bandIndex]]: this is the relation an ingestion pipeline
    * PERSISTS as the corpus near-dup index (see
    * [[graft.streaming.NearDupIngest]] for the streaming writer).
    */
  def bandIndex(df: DataFrame, idCol: String, numHashes: Int,
                bands: Int, textCol: String = "text", k: Int = 3): DataFrame =
    bandRelation(df, idCol, numHashes, bands, textCol, k)

  private def bandRelation(df: DataFrame, idCol: String, numHashes: Int,
                           bands: Int, textCol: String, k: Int): DataFrame = {
    val r = numHashes / bands
    minhashSketch(df, idCol, textCol, k, numHashes).select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        concat_ws(",", (b * r until (b + 1) * r).map(j => col(s"mh$j")): _*)
      }: _*)).as(Seq("band", "sig")))
  }

  /** Drop every member of a band bucket whose membership exceeds `cap` —
    * the guard that keeps bucket self-joins from going quadratic when a
    * real corpus floods near-identical documents into one bucket (a
    * bucket of n members contributes n^2/2 candidate pairs; one
    * million-document flood would dominate the whole job). Exact-duplicate
    * collapse ([[exactKeepFirst]]) is the FIRST line of defense — compose
    * it upstream, as [[nearDupKeepFirst]] does; the cap is the loud
    * backstop for floods that survive it. Dropping a bucket trades recall
    * (its members skip near-dup detection), never correctness of the
    * surviving pairs, and every drop is reported on stderr with sizes.
    *
    * Scale shape: bucket sizes are one partial-agg pass over the
    * sketch-sized band relation; the hot set (buckets over cap) is tiny by
    * construction and broadcast for the anti-join — `banded` itself is
    * never re-shuffled.
    */
  /** Compute the hot-bucket key set of `counted` (buckets above `cap`),
    * reporting drops loudly. r21 (VERDICT r20 task 6): the hot set is NO
    * LONGER collected to the driver — the driver pulls exactly ONE
    * aggregate row (count + dropped-member sum, both exact) for the loud
    * audit, and the key set itself stays distributed behind an eager
    * serialized localCheckpoint (no cache-manager entry, so the
    * per-ingest callers stay leak-free; blocks free via ContextCleaner).
    * A pathological corpus with millions of distinct hot buckets can no
    * longer driver-OOM the audit of the guard that exists to prevent
    * blowups. The common cool path still costs one tiny job (the audit
    * aggregate); the checkpoint job runs only when hot buckets exist.
    */
  private def hotBucketKeys(counted: DataFrame, keys: Seq[String], cap: Int,
                            what: String): Option[DataFrame] = {
    val hotLazy = counted.filter(col("__bsz") > cap)
    val audit = hotLazy
      .agg(count(lit(1)).as("__n"), sum("__bsz").as("__dropped")).collect()(0)
    val n = audit.getAs[Long]("__n")
    if (n == 0L) None
    else {
      val dropped = audit.getAs[Long]("__dropped")
      System.err.println(s"[graft] $what: dropped $n hot " +
        s"bucket(s) (> $cap members, $dropped rows total) from the " +
        s"candidate join; their documents skip near-dup detection — " +
        s"collapse exact duplicates upstream to avoid this")
      Some(hotLazy.select(keys.map(col): _*)
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    }
  }

  private[graft] def capBuckets(banded: DataFrame, keys: Seq[String],
                                cap: Int, what: String): DataFrame = {
    if (cap <= 0) banded
    else {
      val kc = keys.map(col)
      val counted = banded.groupBy(kc: _*).agg(count(lit(1)).as("__bsz"))
      hotBucketKeys(counted, keys, cap, what) match {
        case None => banded
        case Some(hot) => banded.join(broadcast(hot), keys, "left_anti")
      }
    }
  }

  /** [[capBuckets]] for a PAIR of band relations about to be joined
    * against each other (the incremental batch-vs-index shape): hot
    * buckets are judged on COMBINED membership — a per-side cap would
    * miss a bucket that is cool on each side but hot in the union — and
    * dropped from both sides.
    */
  private[graft] def capBucketsPaired(a: DataFrame, b: DataFrame,
                                      keys: Seq[String], cap: Int,
                                      what: String): (DataFrame, DataFrame) = {
    val (ca, cb, _) = capBucketsPairedHot(a, b, keys, cap, what)
    (ca, cb)
  }

  /** [[capBucketsPaired]] that ALSO hands back the hot-bucket key set
    * (None when nothing was dropped) — for callers that re-block the
    * dropped members through a second family instead of losing their
    * recall (the ER flood rescue).
    */
  private[graft] def capBucketsPairedHot(a: DataFrame, b: DataFrame,
                                         keys: Seq[String], cap: Int,
                                         what: String)
      : (DataFrame, DataFrame, Option[DataFrame]) = {
    if (cap <= 0) (a, b, None)
    else {
      val kc = keys.map(col)
      val counted = a.select(kc: _*).unionAll(b.select(kc: _*))
        .groupBy(kc: _*).agg(count(lit(1)).as("__bsz"))
      hotBucketKeys(counted, keys, cap, what) match {
        case None => (a, b, None)
        case Some(hot) =>
          val h = broadcast(hot)
          (a.join(h, keys, "left_anti"), b.join(h, keys, "left_anti"),
            Some(hot))
      }
    }
  }

  def lshCandidatePairs(df: DataFrame, idCol: String,
                        numHashes: Int, bands: Int,
                        textCol: String = "text", k: Int = 3,
                        maxBucketSize: Int = 0): DataFrame = {
    // The band relation is sketch-sized (bands rows x ~50 B per document —
    // orders of magnitude under the corpus). PERSIST it so the bucket
    // self-join reads one materialization instead of recomputing the whole
    // scan->shingle->sketch pipeline per join side (broadcast joins have
    // no common exchange for ReuseExchange to dedup).
    val banded = bandRelation(df, idCol, numHashes, bands, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize ONCE, serially, before the join: its two sides (stream +
    // broadcast thread) would otherwise race to compute the same cache
    // blocks concurrently — observed as multi-10x nondeterministic stalls
    // on block locks.
    banded.count()
    val pruned = capBuckets(banded, Seq("band", "sig"), maxBucketSize,
      "lshCandidatePairs")
    val a = pruned.as("a")
    val b = pruned.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
      && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Incremental-ingestion LSH candidates: near-dup candidates for a NEW
    * batch of documents against an already-ingested corpus, plus within
    * the batch itself — WITHOUT ever joining the old corpus against
    * itself. This is the shape a production pipeline actually runs on
    * every ingest: the corpus band relation is an INDEX (computed once,
    * stored alongside the corpus — here recomputed from `corpus` since
    * the fixture has no persisted index), and each batch pays
    * O(|batch| x bucket density), independent of corpus-squared.
    *
    * Result equals `lshCandidatePairs(corpus union batch)` restricted to
    * pairs touching the batch (band signatures are per-document, so the
    * split changes nothing), with pairs in canonical (min, max) order.
    */
  def incrementalLshCandidates(corpus: DataFrame, batch: DataFrame,
                               idCol: String, numHashes: Int, bands: Int,
                               textCol: String = "text", k: Int = 3,
                               maxBucketSize: Int = 0): DataFrame = {
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bOld = bandRelation(corpus, idCol, numHashes, bands, textCol, k).persist(sl)
    bOld.count() // serial materialization — see lshCandidatePairs
    val bNew = bandRelation(batch, idCol, numHashes, bands, textCol, k).persist(sl)
    bNew.count()
    // Eagerly materialize the (small, candidate-sized) result with a
    // lineage cut, then RELEASE the band-relation caches: this is the
    // per-ingest production path, so leaving bOld/bNew pinned would
    // accumulate cache-manager entries across every ingest of a session.
    // Checkpointed blocks self-free via the ContextCleaner when the
    // returned plan is collected — same rationale as resolveClusters.
    val result = incrementalLshCandidatesIndexed(bOld, bNew, maxBucketSize)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    bOld.unpersist()
    bNew.unpersist()
    result
  }

  /** [[incrementalLshCandidates]] over PREBUILT band relations
    * ([[bandIndex]] rows — what a stored index actually is, so the
    * streaming ingester joins the parquet index directly). Lazy: the
    * caller owns materialization and cache lifecycle.
    */
  def incrementalLshCandidatesIndexed(bOld: DataFrame, bNew: DataFrame,
                                      maxBucketSize: Int = 0): DataFrame = {
    val (pOld, pNew) = capBucketsPaired(bOld, bNew, Seq("band", "sig"),
      maxBucketSize, "incrementalLshCandidates")
    val onBand = col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
    val cross = pNew.as("a").join(pOld.as("b"),
      onBand && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val intra = pNew.as("a").join(pNew.as("b"),
      onBand && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    cross.union(intra).distinct()
  }

  /** Exact n-gram Jaccard over a candidate-pair set: the corpus is first
    * semi-joined down to documents that actually appear in a candidate
    * pair, so the shingle explode + intersection join are sized by the
    * candidate set, not the corpus — at 100 TB the verification cost is
    * O(candidates), independent of corpus size.
    */
  def jaccardVerify(docs: DataFrame, candidates: DataFrame, idCol: String,
                    k: Int, threshold: Double,
                    textCol: String = "text"): DataFrame = {
    // Both relations here are candidate-sized (small by construction) and
    // referenced 2-3 times each — persist so the upstream LSH pipeline and
    // the semi-joined shingle explode run once, not per reference.
    val cand = candidates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand.count() // serial materialization — see lshCandidatePairs
    val candIds = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("cid"))
      .distinct()
    val needed = docs.join(candIds, col(idCol) === col("cid"), "left_semi")
    val sh = shingleRows(needed, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.count() // serial materialization before the 3 dependent joins
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val inter = cand
      .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sh.as("y"), col("doc_b") === col("y.doc_id") && col("x.s") === col("y.s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast("double") /
      (col("ca") + col("cb") - col("inter")).cast("double")
    inter
      .join(sizes.select(col("doc_id"), col("c").as("ca")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("c").as("cb")), col("doc_b") === col("doc_id")).drop("doc_id")
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
  }

  /** Containment-friendly candidate generator: bottom-`nAnchors`
    * shingle-hash blocking. Banded MinHash LSH recalls pairs by
    * SYMMETRIC Jaccard, which is exactly what a quote pair lacks — a
    * 150-char window of a 600-char doc sits near jaccard 0.25, where a
    * 16/4 banding's catch probability is ~1.6%. Bottom-k anchors use
    * the KMV argument instead: a contained document's smallest shingle
    * hashes are (a prefix of) its container's small hashes, so the two
    * share an anchor with probability ≈ 1 − (1 − |Q|/|D|)^k — on the
    * planted-quote fixture, 18/18 quote pairs caught at k = 8.
    *
    * Shape: one shingle pass, one bounded per-doc window (nAnchors
    * rows/doc survive), one anchor-keyed self-join — with the standard
    * hot-bucket cap, because one globally-common shingle with a small
    * hash would otherwise pair every document containing it.
    */
  def anchorCandidatePairs(docs: DataFrame, idCol: String, nAnchors: Int,
                           textCol: String = "text", k: Int = 3,
                           maxBucketSize: Int = 0): DataFrame = {
    val capped = capBuckets(docAnchors(docs, idCol, nAnchors, textCol, k),
      Seq("ah"), maxBucketSize, "anchorCandidatePairs")
    capped.select(col("ah"), col("doc_id").as("doc_a"))
      .join(capped.select(col("ah"), col("doc_id").as("doc_b")), Seq("ah"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** [[anchorCandidatePairs]] over a pre-built (memoized)
    * [[containmentTokens]] relation `(doc_id, w)` — row-identical input
    * to the [[docAnchors]] shingle relation (word grams are per-doc
    * distinct), so the anchors, and hence the candidates, are
    * bit-identical; the shingle explode is shared with the containment
    * verify instead of re-derived.
    */
  def anchorCandidatePairsFrom(tokens: DataFrame, nAnchors: Int,
                               maxBucketSize: Int = 0): DataFrame = {
    val h = tokens.withColumn("ah",
      conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("ah"), col("w"))
    val anchors = h.withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= nAnchors)
      .select(col("ah"), col("doc_id"))
    val capped = capBuckets(anchors, Seq("ah"), maxBucketSize,
      "anchorCandidatePairs")
    capped.select(col("ah"), col("doc_id").as("doc_a"))
      .join(capped.select(col("ah"), col("doc_id").as("doc_b")), Seq("ah"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** The bottom-`nAnchors` anchor relation (ah, doc_id) of
    * [[anchorCandidatePairs]], exposed as the per-document INDEX
    * artifact: a document's anchors never change once computed, so a
    * streaming ingest persists them and probes new batches against the
    * store instead of re-sketching the corpus ([[graft.streaming.QuoteIngest]]).
    */
  def docAnchors(docs: DataFrame, idCol: String, nAnchors: Int,
                 textCol: String = "text", k: Int = 3): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, k)
    val h = sh.withColumn("ah",
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("ah"), col("s"))
    h.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nAnchors)
      .select(col("ah"), col("doc_id"))
  }

  /** Asymmetric CONTAINMENT verification over LSH candidates — the
    * quote/boilerplate detector Jaccard misses: a short document fully
    * embedded in a long one has containment(short in long) ≈ 1 while
    * the symmetric Jaccard stays low (the size skew drowns the
    * overlap), so a pure-Jaccard dedup ships both, including the pure
    * quote. Emits every candidate pair whose LARGER containment
    * reaches `threshold`: `(doc_a, doc_b, jaccard, cont_a_in_b,
    * cont_b_in_a, quote_like)`, with `quote_like` = max containment
    * ≥ 0.8 while jaccard < 0.5 — the asymmetric signature. Candidate-
    * sized relations end-to-end: the corpus is touched only by the
    * candidate semi-join, and since r17 the verify carries each
    * candidate doc's shingle SET as one array row (two hash joins +
    * a map-side `array_intersect`) instead of the three-shuffle
    * exploded-token join — the [[setSimilarityPairs]] verify posture
    * (measured 2.3 → 1.3 s on `dedup_quote_pairs` at sf0.1).
    */
  def containmentPairs(docs: DataFrame, candidates: DataFrame, idCol: String,
                       k: Int, threshold: Double,
                       textCol: String = "text"): DataFrame = {
    val cand = candidates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand.count() // serial materialization — see lshCandidatePairs
    val candIds = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("cid"))
      .distinct()
    val needed = docs.join(candIds, col(idCol) === col("cid"), "left_semi")
    // persisted like the r16 exploded relation was: downstream composers
    // (quote drop, the release chain) re-evaluate the pair subtree, and
    // an unpersisted array build would re-shingle per consumer
    val arr = shingleRows(needed, idCol, textCol, k)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("s")).as("ws"))
      .withColumn("c", size(col("ws")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    arr.count()
    val withArrays = cand
      .join(arr.select(col("doc_id").as("doc_a"), col("ws").as("wa"),
        col("c").as("ca")), Seq("doc_a"))
      .join(arr.select(col("doc_id").as("doc_b"), col("ws").as("wb"),
        col("c").as("cb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("wa"), col("wb"))))
    val jac = col("inter").cast("double") /
      (col("ca") + col("cb") - col("inter")).cast("double")
    val ca = col("inter").cast("double") / col("ca")
    val cb = col("inter").cast("double") / col("cb")
    withArrays
      .filter(greatest(ca, cb) >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"),
        round(ca, 6).as("cont_a_in_b"), round(cb, 6).as("cont_b_in_a"),
        (greatest(ca, cb) >= 0.8 && jac < 0.5).cast("int").as("quote_like"))
  }

  /** [[containmentPairs]] over a pre-built (memoized)
    * [[containmentDocTokens]] relation — the candidate-restricted
    * verify without the per-leg re-shingle: arrays come from the shared
    * `ts` (set-equal to the collect_set the inline face builds; the
    * intersection size, and so every output column, is identical).
    */
  def containmentPairsFrom(docTokens: DataFrame, candidates: DataFrame,
                           threshold: Double): DataFrame = {
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cand = candidates.persist(sl)
    cand.count() // serial materialization — see lshCandidatePairs
    val candIds = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("cid"))
      .distinct()
    val arr = docTokens
      .join(candIds, col("doc_id") === col("cid"), "left_semi")
      .select(col("doc_id"),
        transform(col("ts"), x => x.getField("w")).as("ws"),
        col("s").as("c"))
      .persist(sl)
    arr.count()
    val withArrays = cand
      .join(arr.select(col("doc_id").as("doc_a"), col("ws").as("wa"),
        col("c").as("ca")), Seq("doc_a"))
      .join(arr.select(col("doc_id").as("doc_b"), col("ws").as("wb"),
        col("c").as("cb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("wa"), col("wb"))))
    val jac = col("inter").cast("double") /
      (col("ca") + col("cb") - col("inter")).cast("double")
    val ca = col("inter").cast("double") / col("ca")
    val cb = col("inter").cast("double") / col("cb")
    withArrays
      .filter(greatest(ca, cb) >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"),
        round(ca, 6).as("cont_a_in_b"), round(cb, 6).as("cont_b_in_a"),
        (greatest(ca, cb) >= 0.8 && jac < 0.5).cast("int").as("quote_like"))
  }

  /** Full fuzzy-dedup pipeline: banded-LSH candidates, then exact Jaccard
    * verification (the canonical two-phase near-dup shape at scale).
    * `maxBucketSize` > 0 enables the hot-bucket backstop ([[capBuckets]]).
    */
  def fuzzy(docs: DataFrame, idCol: String, numHashes: Int, bands: Int,
            threshold: Double, textCol: String = "text", k: Int = 3,
            maxBucketSize: Int = 0): DataFrame =
    jaccardVerify(docs,
      lshCandidatePairs(docs, idCol, numHashes, bands, textCol, k, maxBucketSize),
      idCol, k, threshold, textCol)

  /** Recall audit for the hot-bucket cap (VERDICT r19 task 4): ONE row
    * quantifying what `maxBucketSize = cap` would drop from the
    * banded-LSH candidate stage over `docs` — total band buckets, hot
    * buckets (> cap members), band rows inside them, and the distinct
    * documents with membership in ANY hot bucket. NOTE (ADVICE r20):
    * `docs_affected` is an UPPER BOUND on the recall exposure, not the
    * exact loss — a doc in one hot bucket can still be detected through
    * a non-hot bucket in another band; the exact missed-pair count
    * (all-witnesses-hot) is what `ScaleProbe publish_cap_audit`
    * measures, and it is always <= this column's implication. The
    * [[capBuckets]] stderr line reports drops at run time; this is the
    * same information as a RELATION, so a deployment can record the
    * cap's recall exposure next to its ladder rungs (the
    * [[graft.streaming.IvfIngest.balanceAudit]] convention: audits are
    * first-class queries, not log lines). Cost: one band-relation
    * build + one sketch-sized aggregate — never a pair join, so the
    * audit is safe to run at caps and scales where the uncapped join
    * itself is not.
    */
  def lshCapAudit(docs: DataFrame, idCol: String, numHashes: Int,
                  bands: Int, cap: Int, textCol: String = "text",
                  k: Int = 3): DataFrame = {
    require(cap > 0, s"lshCapAudit needs a positive cap, got $cap")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val banded = bandIndex(docs, idCol, numHashes, bands, textCol, k)
      .persist(sl)
    banded.count() // serial materialization — see lshCandidatePairs
    val sizes = banded.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("bsz")).persist(sl)
    sizes.count()
    val hot = sizes.filter(col("bsz") > cap)
    // documents losing detection: members of ANY hot bucket (the hot
    // set is bounded by corpus/cap rows; the join is sketch-sized and
    // AQE picks the strategy — no forced broadcast, the audit must
    // stay safe at any scale)
    val hotDocs = banded.join(hot.select(col("band"), col("sig")),
        Seq("band", "sig"), "left_semi")
      .select(col("doc_id")).distinct()
    val out = sizes.agg(count(lit(1)).as("n_buckets"))
      .crossJoin(hot.agg(count(lit(1)).as("n_hot_buckets"),
        coalesce(sum(col("bsz")), lit(0L)).as("band_rows_dropped")))
      .crossJoin(hotDocs.agg(count(lit(1)).as("docs_affected")))
      .select(lit(cap).as("cap"), col("n_buckets"),
        col("n_hot_buckets"), col("band_rows_dropped"),
        col("docs_affected"))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER) // eager: release the persists below safely
    banded.unpersist()
    sizes.unpersist()
    out
  }

  /** Incremental (batch-vs-index) face of [[setSimilarityPairs]] — the
    * exact-similarity analogue of [[incrementalLshCandidates]]: every
    * pair (new, old) and (new, new) with shingle-set Jaccard >=
    * `threshold`; the old corpus is never self-joined. The vocabulary
    * order is PINNED to the CORPUS-ONLY document frequencies: the
    * prefix lemma holds under ANY total order (frequency is only the
    * selectivity heuristic), so a production index can compute its
    * prefixes once and serve every future batch without re-ordering —
    * batch tokens unseen in the corpus order first (df 0, the rarest
    * position, which is also the selective choice). Exactness is
    * unaffected; only prefix selectivity ages with corpus drift.
    *
    * r17: the PPJoin length + positional filters and the array-based
    * verify of [[setSimilarityPairs]] apply here too (both are
    * pair-local consequences of J ≥ t, valid under the pinned order);
    * only the ASYMMETRIC prefix stays out — pair roles here are
    * new/old, which do not align with the (size, id) order the short
    * indexing prefix needs, so both sides keep the standard AllPairs
    * prefix.
    */
  def setSimilarityIncremental(corpus: DataFrame, batch: DataFrame,
                               idCol: String, threshold: Double,
                               textCol: String = "text", k: Int = 3,
                               maxBucketSize: Int = 0): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val eps = 1e-9
    def shingles(d: DataFrame) =
      shingleRows(d.select(col(idCol), col(textCol)), idCol, textCol, k)
        .select(col("doc_id"), col("s").as("w")).distinct()
    val tkOld = shingles(corpus).persist(sl); tkOld.count()
    val tkNew = shingles(batch).persist(sl); tkNew.count()
    val dfreq = tkOld.groupBy(col("w")).agg(count(lit(1)).as("df"))
    def docTok(tk: DataFrame): DataFrame =
      tk.join(dfreq, Seq("w"), "left")
        .select(col("doc_id"), col("w"), coalesce(col("df"), lit(0L)).as("df"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("ts"))
        .withColumn("s", size(col("ts")))
        .withColumn("p",
          col("s") - ceil(lit(threshold) * col("s") - lit(eps)).cast("int") + 1)
    val dtOld = docTok(tkOld).persist(sl); dtOld.count()
    val dtNew = docTok(tkNew).persist(sl); dtNew.count()
    def prefixRows(dt: DataFrame): DataFrame =
      dt.select(col("doc_id"), col("s"),
          posexplode(expr("slice(ts, 1, p)")).as(Seq("p0", "pt")))
        .select(col("doc_id"), col("s"), (col("p0") + 1).as("pos"),
          col("pt.w").as("w"))
    val (pn, po) = capBucketsPaired(prefixRows(dtNew), prefixRows(dtOld),
      Seq("w"), maxBucketSize, "setSimilarityIncremental")
    val pnP = pn.persist(sl); pnP.count()
    def leg(a: DataFrame, b: DataFrame, pred: Column): DataFrame =
      a.select(col("w"), col("doc_id").as("na"), col("s").as("sa"),
          col("pos").as("ia"))
        .join(b.select(col("w"), col("doc_id").as("nb"), col("s").as("sb"),
          col("pos").as("ib")), Seq("w"))
        .filter(pred)
        // length filter, both directions (the pair is not size-ordered)
        .filter(col("sa").cast("double") >=
            lit(threshold) * col("sb") - lit(eps) &&
          col("sb").cast("double") >=
            lit(threshold) * col("sa") - lit(eps))
        .groupBy(col("na"), col("nb"))
        .agg(min(struct(col("ia"), col("ib"))).as("m"),
          first(col("sa")).as("sa"), first(col("sb")).as("sb"))
        // positional filter at the first common token (min ia over the
        // match rows IS the globally-minimal common token: both arrays
        // sort by the pinned order and the lemma puts it in both
        // prefixes)
        .filter(lit(1) +
          least(col("sa") - col("m.ia"), col("sb") - col("m.ib")) >=
          ceil(lit(threshold / (1 + threshold)) *
            (col("sa") + col("sb")) - lit(eps)))
        .select(col("na"), col("nb"))
    // a REPLAYED document sits in both relations; id inequality excludes
    // the self-pair exactly (ids are unique per document)
    val cross = leg(pnP, po, col("na") =!= col("nb"))
    val self = leg(pnP, pnP, col("na") < col("nb"))
    val cand = cross.unionByName(self)
      .select(least(col("na"), col("nb")).as("doc_a"),
        greatest(col("na"), col("nb")).as("doc_b"))
      .distinct()
      .persist(sl)
    cand.count()
    // one sorted-token row per doc even under replay: the same text
    // yields the same token set, hence the same ts/s on either side —
    // dropDuplicates keeps the verify's sizes exact (the r16 lesson:
    // double-counted token rows inflate inter AND the sizes)
    val arr = dtNew.unionByName(dtOld).dropDuplicates("doc_id")
      .select(col("doc_id"),
        transform(col("ts"), x => x.getField("w")).as("ws"),
        col("s"))
    val withArrays = cand
      .join(arr.select(col("doc_id").as("doc_a"), col("ws").as("wa"),
        col("s").as("sa")), Seq("doc_a"))
      .join(arr.select(col("doc_id").as("doc_b"), col("ws").as("wb"),
        col("s").as("sb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("wa"), col("wb"))))
    val jac = col("inter").cast("double") /
      (col("sa") + col("sb") - col("inter")).cast("double")
    withArrays
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
  }

  /** EXACT word-set similarity self-join via prefix filtering — the
    * AllPairs/SSJoin family (Bayardo, Ma & Srikant, "Scaling Up All
    * Pairs Similarity Search", WWW 2007; Chaudhuri, Ganti & Kaushik,
    * ICDE 2006), upgraded to PPJoin-grade candidate pruning (Xiao,
    * Wang, Lin & Yu, "Efficient Similarity Joins for Near Duplicate
    * Detection", WWW 2008 — implemented from scratch on relational
    * primitives): every unordered document pair whose token-SET
    * Jaccard reaches `threshold`, with EXACT cross-product semantics —
    * the deterministic companion to banded-LSH [[fuzzy]], which trades
    * a tunable miss probability for its candidate bound.
    *
    * Prefix lemma: order the vocabulary globally (document frequency
    * ascending, token text as tiebreak — rarest first, so prefixes are
    * maximally selective) and keep each document's first
    * p = s − ceil(t·s) + 1 tokens of its sorted set (s = set size). If
    * jaccard(A, B) ≥ t then |A∩B| ≥ t·|A∪B| ≥ ceil(t·|A|), so were the
    * globally-smallest shared token outside A's prefix, the whole
    * intersection would fit in A's suffix of ceil(t·|A|) − 1 tokens —
    * contradiction; symmetrically for B. The prefix-prefix equi-join
    * therefore has ZERO false negatives, and the exact Jaccard verify
    * removes the false positives. Three LOSSLESS prunes ride on top
    * (each a consequence of J ≥ t, so no true pair can fail them):
    *
    *  - asymmetric prefixes (PPJoin's indexing prefix): order each pair
    *    so A is the (size, id)-smaller side. The required overlap
    *    α = ⌈t/(1+t)·(sa+sb)⌉ is ≥ ⌈2t/(1+t)·sa⌉, so the pair's FIRST
    *    common token sits within A's first sa − ⌈2t/(1+t)·sa⌉ + 1
    *    tokens — a strictly shorter prefix than AllPairs' (one third vs
    *    one half of the set at t = 0.5), shrinking the join's left side;
    *  - length filter: J ≥ t ⇒ sa ≥ t·sb, applied as a join residual
    *    before any aggregation;
    *  - positional filter: for the first common token at positions
    *    (i, j), |A∩B| ≤ 1 + min(sa − i, sb − j); pairs where that bound
    *    is < α die before verification. The first common token IS the
    *    (i, j)-minimal prefix match (the arrays sort by the same global
    *    order), so one min-struct aggregate finds it.
    *
    * Verification fetches each candidate's sorted token ARRAY (two hash
    * joins against the doc-count-sized docTokens relation) and computes
    * the exact intersection map-side via `array_intersect` — candidate-
    * sized work, replacing the r16 token-explode verify whose three
    * shuffles carried candidate × token rows (this is where PPJoin+'s
    * suffix filter would live; with the array in hand the exact
    * intersection costs the same O(sa+sb) as the suffix probe, so the
    * filter is subsumed rather than approximated).
    *
    * Scale shape: token and prefix relations are corpus-linear; the
    * candidate join keys on prefix tokens (rare by construction), with
    * the standard hot-bucket cap for the degenerate corpus (tiny
    * documents built entirely from the same frequent words); the
    * verify join is candidate-sized (the [[jaccardVerify]] posture).
    * The document-frequency relation is VOCABULARY-sized — the global
    * order is a vocabulary artifact, like a codebook.
    */
  def setSimilarityPairs(docs: DataFrame, idCol: String, threshold: Double,
                         textCol: String = "text", k: Int = 3,
                         maxBucketSize: Int = 0): DataFrame = {
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val (cand, docTokens) =
      setSimilarityCandidates(docs, idCol, threshold, textCol, k,
        maxBucketSize)
    val candP = cand.persist(sl)
    candP.count()
    val arr = docTokens.select(col("doc_id"),
      transform(col("ts"), x => x.getField("w")).as("ws"))
    val inter = candP
      .join(arr.select(col("doc_id").as("doc_a"), col("ws").as("wa")),
        Seq("doc_a"))
      .join(arr.select(col("doc_id").as("doc_b"), col("ws").as("wb")),
        Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("wa"), col("wb"))))
    val jac = col("inter").cast("double") /
      (col("sa") + col("sb") - col("inter")).cast("double")
    inter
      .filter(jac >= threshold)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"),
        round(jac, 6).as("jaccard"))
  }

  /** Candidate generation for [[setSimilarityPairs]] — exposed
    * separately so the scale ladder can count candidates (the metric
    * the PPJoin filters exist to cut). Returns (candidates with both
    * set sizes, the persisted per-doc sorted-token relation).
    */
  private[graft] def setSimilarityCandidates(
      docs: DataFrame, idCol: String, threshold: Double,
      textCol: String, k: Int,
      maxBucketSize: Int): (DataFrame, DataFrame) = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the set universe is k-shingles (k = 1 -> word sets). Prefix
    // filtering needs a DIVERSE universe to prune: a tiny vocabulary
    // (the 31-word synthetic corpus) makes every "rare" prefix token
    // corpus-common and the candidate set near-quadratic — the PPJoin
    // filters bound that regime (see the word-mode ladder row in
    // BASELINE.md), and shingles remain the default diverse unit (the
    // same reason the LSH family sketches k = 3 grams, not words).
    val tk = shingleRows(docs.select(col(idCol), col(textCol)),
        idCol, textCol, k)
      .select(col("doc_id"), col("s").as("w"))
      .distinct()
      .persist(sl)
    tk.count()
    val freq = tk.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // ceil over the RATIONAL t·s, guarded against float overshoot: for a
    // threshold whose double sits just above its rational (0.8, 0.7 …),
    // t*s can land epsilon ABOVE an exact integer k and ceil to k+1 —
    // one token too few in the prefix, a silent false negative. The
    // 1e-9 back-off restores k (real fractional parts are >= 1/s,
    // orders of magnitude above it). Same guard on every derived bound
    // below — each one must only ever err towards KEEPING a pair.
    val eps = 1e-9
    val idxFrac = 2 * threshold / (1 + threshold)
    val docTokens = tk.join(freq, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("ts"))
      .withColumn("s", size(col("ts")))
      .withColumn("p",
        col("s") -
          ceil(lit(threshold) * col("s") - lit(eps)).cast("int") + 1)
      .withColumn("pi",
        col("s") -
          ceil(lit(idxFrac) * col("s") - lit(eps)).cast("int") + 1)
      .persist(sl)
    docTokens.count()
    // prefix rows carry the 1-based POSITION in the doc's sorted set —
    // the positional filter's input
    def prefixRows(lenCol: String): DataFrame =
      docTokens
        .select(col("doc_id"), col("s"),
          posexplode(expr(s"slice(ts, 1, $lenCol)")).as(Seq("p0", "pt")))
        .select(col("doc_id"), col("s"), (col("p0") + 1).as("pos"),
          col("pt.w").as("w"))
    val (pShort, pStd) = capBucketsPaired(
      prefixRows("pi"), prefixRows("p"), Seq("w"), maxBucketSize,
      "setSimilarityPairs")
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("sa") + col("sb")) - lit(eps))
    val cand = pShort.select(col("w"), col("doc_id").as("doc_a"),
        col("s").as("sa"), col("pos").as("ia"))
      .join(pStd.select(col("w"), col("doc_id").as("doc_b"),
        col("s").as("sb"), col("pos").as("ib")), Seq("w"))
      // A = the (size, id)-smaller side; its SHORT prefix suffices
      .filter(struct(col("sa"), col("doc_a")) <
        struct(col("sb"), col("doc_b")))
      // length filter: J >= t forces sa >= t*sb
      .filter(col("sa").cast("double") >=
        lit(threshold) * col("sb") - lit(eps))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(struct(col("ia"), col("ib"))).as("m"),
        first(col("sa")).as("sa"), first(col("sb")).as("sb"))
      // positional filter at the first common token
      .filter(lit(1) +
        least(col("sa") - col("m.ia"), col("sb") - col("m.ib")) >= alpha)
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
    (cand, docTokens)
  }

  /** EXACT containment self-join (r17): every unordered pair whose
    * LARGER containment max(|A∩B|/|A|, |A∩B|/|B|) reaches `threshold`,
    * with cross-product semantics — the zero-false-negative companion
    * of the anchor-blocked [[anchorCandidatePairs]] +
    * [[containmentPairs]] composition, exactly as [[setSimilarityPairs]]
    * is to banded LSH. Same output schema as [[containmentPairs]].
    *
    * Blocking: containment admits a prefix lemma only on the CONTAINED
    * side — c(A in B) ≥ t ⇒ |A∩B| ≥ ⌈t·|A|⌉ ⇒ the globally-minimal
    * common token lies in A's first s − ⌈t·s⌉ + 1 tokens; the container
    * side has NO length relation to exploit (a 10-token quote can live
    * in a 10^6-token book), so the join is prefix(contained) ×
    * FULL-token(container) — candidate volume rides the token
    * frequency skew, which is precisely why the approximate anchor
    * family exists for corpora whose shingle universe is dense; the
    * hot-token cap ([[capBucketsPaired]], combined membership) bounds
    * the flood loudly. A positional filter prunes before verification:
    * at the first common token (positions i, j under the global
    * rare-first order), |A∩B| ≤ 1 + min(sa − i, sb − j), which any
    * qualifying pair needs ≥ ⌈t·min(sa, sb)⌉. Verification fetches
    * both sorted token arrays and intersects map-side (the
    * [[setSimilarityPairs]] posture) — candidate-sized, exact.
    */
  def containmentSelfPairs(docs: DataFrame, idCol: String,
                           threshold: Double, textCol: String = "text",
                           k: Int = 3, maxBucketSize: Int = 0): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tk = containmentTokens(docs, idCol, textCol, k).persist(sl)
    tk.count()
    val docTokens = containmentDocTokens(tk).persist(sl)
    docTokens.count()
    containmentSelfPairsFrom(docTokens, threshold, maxBucketSize)
  }

  /** The distinct shingle-token relation `(doc_id, w)` over one corpus
    * — THE shared sub-build of the whole containment/anchor family
    * ([[containmentSelfPairs]], [[anchorCandidatePairsFrom]],
    * [[containmentPairsFrom]] all derive from it), exposed so audits
    * that by definition run SEVERAL legs over the same corpus
    * (`dedup_quote_missed` = exact join + anchored pipeline) can build
    * the shingle explode ONCE and memoize it
    * ([[graft.queries.BuildMemo]]) instead of re-deriving it per leg.
    * Row-identical to [[shingleRows]] (word-gram generation is already
    * per-doc distinct); the global distinct is the defensive contract
    * the family has always applied.
    */
  def containmentTokens(docs: DataFrame, idCol: String,
                        textCol: String = "text", k: Int = 3): DataFrame =
    shingleRows(docs.select(col(idCol), col(textCol)), idCol, textCol, k)
      .select(col("doc_id"), col("s").as("w"))
      .distinct()

  /** Frequency-sorted per-doc token arrays `(doc_id, ts, s)` derived
    * from [[containmentTokens]] — the verify-side artifact of the
    * containment family (and the prefix source of
    * [[containmentSelfPairsFrom]]). `ts` is the doc's tokens sorted by
    * (corpus document frequency, token) — rare-first, the
    * prefix-lemma order; `s` its size. Corpus-linear; memoizable.
    */
  def containmentDocTokens(tokens: DataFrame): DataFrame = {
    val freq = tokens.groupBy(col("w")).agg(count(lit(1)).as("df"))
    tokens.join(freq, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("ts"))
      .withColumn("s", size(col("ts")))
  }

  /** [[containmentSelfPairs]] over a pre-built (memoized or persisted)
    * [[containmentDocTokens]] relation — the face the quote-audit
    * queries consume so the shingle/freq/array sub-builds are shared
    * across legs instead of rebuilt per leg (r17 verdict: the exact
    * and anchored legs of `dedup_quote_missed` each re-derived them).
    */
  def containmentSelfPairsFrom(docTokens0: DataFrame, threshold: Double,
                               maxBucketSize: Int = 0): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val eps = 1e-9
    val docTokens = docTokens0
      .withColumn("p",
        col("s") -
          ceil(lit(threshold) * col("s") - lit(eps)).cast("int") + 1)
    def rowsOf(lenCol: Column): DataFrame =
      docTokens
        .select(col("doc_id"), col("s"),
          posexplode(slice(col("ts"), lit(1), lenCol)).as(Seq("p0", "pt")))
        .select(col("doc_id"), col("s"), (col("p0") + 1).as("pos"),
          col("pt.w").as("w"))
    val (pPfx, pAll) = capBucketsPaired(rowsOf(col("p")), rowsOf(col("s")),
      Seq("w"), maxBucketSize, "containmentSelfPairs")
    val cand = pPfx.select(col("w"), col("doc_id").as("na"),
        col("s").as("sa"), col("pos").as("ia"))
      .join(pAll.select(col("w"), col("doc_id").as("nb"), col("s").as("sb"),
        col("pos").as("ib")), Seq("w"))
      .filter(col("na") =!= col("nb"))
      .groupBy(col("na"), col("nb"))
      .agg(min(struct(col("ia"), col("ib"))).as("m"),
        first(col("sa")).as("sa"), first(col("sb")).as("sb"))
      .filter(lit(1) +
        least(col("sa") - col("m.ia"), col("sb") - col("m.ib")) >=
        ceil(lit(threshold) * least(col("sa"), col("sb")) - lit(eps)))
      .select(least(col("na"), col("nb")).as("doc_a"),
        greatest(col("na"), col("nb")).as("doc_b"))
      .distinct()
      .persist(sl)
    cand.count()
    val arr = docTokens.select(col("doc_id"),
      transform(col("ts"), x => x.getField("w")).as("ws"), col("s"))
    val withArrays = cand
      .join(arr.select(col("doc_id").as("doc_a"), col("ws").as("wa"),
        col("s").as("sa")), Seq("doc_a"))
      .join(arr.select(col("doc_id").as("doc_b"), col("ws").as("wb"),
        col("s").as("sb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("wa"), col("wb"))))
    val jac = col("inter").cast("double") /
      (col("sa") + col("sb") - col("inter")).cast("double")
    val ca = col("inter").cast("double") / col("sa")
    val cb = col("inter").cast("double") / col("sb")
    withArrays
      .filter(greatest(ca, cb) >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"),
        round(ca, 6).as("cont_a_in_b"), round(cb, 6).as("cont_b_in_a"),
        (greatest(ca, cb) >= 0.8 && jac < 0.5).cast("int").as("quote_like"))
  }

  /** EXACT WEIGHTED set-similarity self-join (r17): every unordered
    * pair whose weighted Jaccard Σ_t min(tf_a, tf_b) / Σ_t max(tf_a,
    * tf_b) reaches `threshold`, weights = term frequency of the k-gram
    * within the document. The multiset companion of
    * [[setSimilarityPairs]]: set semantics treat "spam spam spam spam"
    * and one "spam" as identical; weighted Jaccard does not — the
    * standard similarity for boilerplate whose REPETITION is the
    * signature.
    *
    * Weighted prefix lemma (the generalization in Chaudhuri, Ganti &
    * Kaushik, ICDE 2006): order tokens globally (df ascending, token
    * text tiebreak); per doc keep the positions whose SUFFIX WEIGHT
    * (Σ tf from the position on) is ≥ t·S (S = Σ tf). J_w ≥ t forces
    * the shared weight m ≥ t/(1+t)·(S_a+S_b) ≥ t·S_a (using the
    * weighted length filter S_b ≥ t·S_a, itself forced by J_w ≤
    * S_a/S_b); were every shared token outside A's weighted prefix, m
    * could not exceed the sub-t·S_a suffix weight — contradiction, so
    * the prefix-prefix equi-join has zero false negatives. The
    * positional filter rides the carried suffix weights: at the first
    * shared token, m ≤ min(suffixW_a, suffixW_b) must reach
    * t/(1+t)·(S_a+S_b). The verify is the exploded shared-token join
    * summing least(tf_a, tf_b) — m plus the two doc weight sums
    * recover Σ max = S_a + S_b − m exactly (min + max = a + b per
    * token, zero min on non-shared).
    *
    * Scale shape: tf and prefix relations are corpus-linear; the
    * candidate join keys on rare-first prefix tokens with the standard
    * hot-bucket cap; the verify join is candidate-sized.
    */
  def weightedSetSimilarityPairs(docs: DataFrame, idCol: String,
                                 threshold: Double,
                                 textCol: String = "text", k: Int = 1,
                                 maxBucketSize: Int = 0): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val eps = 1e-9
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // NON-distinct grams: the weights ARE the duplicate counts
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(coalesce(
        call_function("graft_word_grams", lower(col(textCol)), lit(k),
          lit(false)),
        typedLit(Seq.empty[String]))).as("w"))
    val tf = grams.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .persist(sl)
    tf.count()
    val freq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val docTokens = tf.join(freq, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
          struct(col("df"), col("w"), col("tf")))).as("ts"),
        sum(col("tf")).as("sw"))
      .persist(sl)
    docTokens.count()
    // prefix rows carry the suffix weight: cumulative tf from the row's
    // position to the end of the doc's sorted token list
    val prefix = docTokens
      .select(col("doc_id"), col("sw"),
        posexplode(col("ts")).as(Seq("p0", "pt")))
      .withColumn("suffw", col("sw") - sum(col("pt.tf")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("p0")))
        + col("pt.tf"))
      .filter(col("suffw").cast("double") >=
        lit(threshold) * col("sw") - lit(eps))
      .select(col("doc_id"), col("sw"), col("suffw"),
        col("pt.w").as("w"))
    val pruned = capBuckets(prefix, Seq("w"), maxBucketSize,
      "weightedSetSimilarityPairs")
    val alpha = lit(threshold / (1 + threshold)) *
      (col("sa") + col("sb")) - lit(eps)
    val cand = pruned.select(col("w"), col("doc_id").as("doc_a"),
        col("sw").as("sa"), col("suffw").as("fa"))
      .join(pruned.select(col("w"), col("doc_id").as("doc_b"),
        col("sw").as("sb"), col("suffw").as("fb")), Seq("w"))
      .filter(col("doc_a") < col("doc_b"))
      // weighted length filter, both directions
      .filter(col("sa").cast("double") >=
          lit(threshold) * col("sb") - lit(eps) &&
        col("sb").cast("double") >=
          lit(threshold) * col("sa") - lit(eps))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(least(col("fa"), col("fb"))).as("bound"),
        first(col("sa")).as("sa"), first(col("sb")).as("sb"))
      // positional filter: the BEST shared-token bound must clear the
      // required shared weight (max over matches is the sound bound —
      // every match row's min(suffw) is a valid upper bound for the
      // weight shared FROM that token on, and the first shared token's
      // row bounds all of m)
      .filter(col("bound").cast("double") >= alpha)
      .select(col("doc_a"), col("doc_b"))
      .persist(sl)
    cand.count()
    // MERGE-WALK verify (r19): one codegen'd sorted-merge Σ min(tf)
    // per pair instead of the exploded shared-token join — the same
    // candidate-row-bound shape as the containment faces
    val m = weightedMergeVerify(cand, tf,
      docTokens.select(col("doc_id"), col("sw")),
      "weightedSetSimilarityPairs")
    val jw = col("m").cast("double") /
      (col("sa") + col("sb") - col("m")).cast("double")
    m.filter(jw >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jw, 6).as("wjaccard"))
  }

  /** EXACT WEIGHTED containment self-join — the multiset analogue of
    * [[containmentSelfPairs]] and the containment face of
    * [[weightedSetSimilarityPairs]]: every unordered pair whose larger
    * WEIGHTED containment Σ_t min(tf_a, tf_b) / S_side reaches
    * `threshold` (S = the side's total term weight). Set containment
    * calls a page that repeats a boilerplate line 50 times "contained"
    * after one occurrence; the weighted form demands the REPETITION be
    * covered too — the honest detector for templated spam.
    *
    * Blocking: the SMALLER-weight side's weighted prefix (positions
    * whose suffix weight ≥ t·S — if every shared token sat below that,
    * the shared weight could not reach t·S_min) joined against the
    * larger side's FULL weighted token list (no length relation exists,
    * as in the set case, but the weight ORDER picks the one prefix the
    * lemma needs — r19, halving the old symmetric prefix × full match
    * volume); pair-level SUFFIX filter (PPJoin+ adapted to weighted
    * containment — exact matched-prefix weight plus the min of the two
    * tails after the last match bounds m from above; the candidate set
    * this kills was 99.5% of the verify's input at the k=4 ladder
    * rung); exploded Σ min(tf) verify, candidate-sized.
    */
  def weightedContainmentPairs(docs: DataFrame, idCol: String,
                               threshold: Double,
                               textCol: String = "text", k: Int = 1,
                               maxBucketSize: Int = 0): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val eps = 1e-9
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(coalesce(
        call_function("graft_word_grams", lower(col(textCol)), lit(k),
          lit(false)),
        typedLit(Seq.empty[String]))).as("w"))
    val tf = grams.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .persist(sl)
    tf.count()
    val freq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val docTokens = tf.join(freq, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
          struct(col("df"), col("w"), col("tf")))).as("ts"),
        sum(col("tf")).as("sw"))
      .persist(sl)
    docTokens.count()
    val rows = docTokens
      .select(col("doc_id"), col("sw"),
        posexplode(col("ts")).as(Seq("p0", "pt")))
      .withColumn("suffw", col("sw") - sum(col("pt.tf")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("p0")))
        + col("pt.tf"))
      .select(col("doc_id"), col("sw"), col("suffw"),
        col("pt.w").as("w"), col("pt.tf").as("tf"))
      // both candidate-join sides read this relation (prefix is a
      // filter of it), so the per-doc suffix-weight window runs once
      .persist(sl)
    rows.count()
    val prefix = rows.filter(col("suffw").cast("double") >=
      lit(threshold) * col("sw") - lit(eps))
    val (pPfx, pAll) = capBucketsPaired(prefix, rows, Seq("w"),
      maxBucketSize, "weightedContainmentPairs")
    // r19 (verdict task 5, the k=4 ladder rung). Two exact prunes:
    //
    // (1) The pair survives iff m >= t*min(Sa, Sb), so the prefix lemma
    // only needs the SMALLER side's prefix — the weight-order join
    // condition halves the match rows of the old symmetric prefix x
    // full join (every pair arrived through BOTH role assignments).
    //
    // (2) The old positional filter (max over matches of min suffix
    // weight >= t*S_min) was TOOTHLESS for the asymmetric pairs
    // containment exists for: with Sb >> Sa, any late token of B still
    // carries suffw_b >= t*Sa, so ~all blocking pairs passed and the
    // exploded verify ran |cand| x doc-length rows (measured at k=4:
    // 7.1M candidates for 34k true pairs — the whole 69 s rung).
    // The match rows already hold the tight bound (PPJoin+'s suffix
    // filter, weighted): the token lists share ONE global (df, w)
    // order, so per pair, m <= [sum of min(tf_a, tf_b) over matched
    // prefix tokens] + min(A tail, B tail) where the tails are the
    // suffix weights strictly after the LAST matched prefix token
    // (suffw − tf at that row — suffw is strictly decreasing within a
    // doc, so min(struct(fa ...)) picks it deterministically). Shared
    // tokens at or before the last match in A's prefix are summed
    // exactly; everything after (including A's whole below-prefix
    // suffix) is capped by both tails. A true pair keeps
    // bound >= m >= t*Sa, so the filter has zero false negatives.
    val cand = pPfx.select(col("w"), col("doc_id").as("na"),
        col("sw").as("sa"), col("suffw").as("fa"), col("tf").as("ta"))
      .join(pAll.select(col("w"), col("doc_id").as("nb"),
        col("sw").as("sb"), col("suffw").as("fb"), col("tf").as("tb")),
        Seq("w"))
      .filter(col("sa") < col("sb") ||
        (col("sa") === col("sb") && col("na") < col("nb")))
      .groupBy(col("na"), col("nb"))
      .agg(sum(least(col("ta"), col("tb"))).as("ms"),
        min(struct(col("fa"), col("ta"), col("fb"), col("tb")))
          .as("lastr"),
        first(col("sa")).as("sa"))
      .filter((col("ms") +
          least(col("lastr.fa") - col("lastr.ta"),
            col("lastr.fb") - col("lastr.tb"))).cast("double") >=
        lit(threshold) * col("sa") - lit(eps))
      .select(least(col("na"), col("nb")).as("doc_a"),
        greatest(col("na"), col("nb")).as("doc_b"))
      .persist(sl)
    cand.count()
    // MERGE-WALK verify (r19): containment candidates are inherently
    // false-positive-heavy (one shared rare early token defeats every
    // candidate-level bound — at the k=4 ladder rung 7.1M of 7.1M
    // candidates reached verify for 34k true pairs), so the verify
    // must be candidate-row-bound, not candidate×doc-length — no
    // exploded shared-token join, no 10⁸-row pair aggregate behind it
    val m = weightedMergeVerify(cand, tf,
      docTokens.select(col("doc_id"), col("sw")),
      "weightedContainmentPairs")
    val jw = col("m").cast("double") /
      (col("sa") + col("sb") - col("m")).cast("double")
    val ca = col("m").cast("double") / col("sa")
    val cb = col("m").cast("double") / col("sb")
    m.filter(greatest(ca, cb) >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jw, 6).as("wjaccard"),
        round(ca, 6).as("wcont_a_in_b"), round(cb, 6).as("wcont_b_in_a"))
  }

  /** Shared weighted-relation builds of the incremental (batch-vs-
    * index) weighted faces: per-side term-frequency relations, the
    * vocabulary order PINNED to corpus-only document frequencies
    * (the [[setSimilarityIncremental]] contract — any total order
    * satisfies the weighted prefix lemma, so a production index keeps
    * its order as batches arrive; batch-only tokens order first at
    * df 0), per-side exploded rows carrying each position's SUFFIX
    * WEIGHT, and the replay-deduped verify relations.
    */
  private case class WeightedSides(rowsNew: DataFrame, rowsOld: DataFrame,
                                   tfAll: DataFrame, sums: DataFrame)

  private def weightedIncrementalRows(corpus: DataFrame, batch: DataFrame,
                                      idCol: String, textCol: String,
                                      k: Int): WeightedSides = {
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def grams(d: DataFrame) = d.select(col(idCol).as("doc_id"),
      explode(coalesce(
        call_function("graft_word_grams", lower(col(textCol)), lit(k),
          lit(false)),
        typedLit(Seq.empty[String]))).as("w"))
    def tfOf(d: DataFrame) = grams(d).groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val tfOld = tfOf(corpus).persist(sl); tfOld.count()
    val tfNew = tfOf(batch).persist(sl); tfNew.count()
    val dfreq = tfOld.groupBy(col("w")).agg(count(lit(1)).as("df"))
    def docTok(tf: DataFrame): DataFrame =
      tf.join(dfreq, Seq("w"), "left")
        .select(col("doc_id"), col("w"),
          coalesce(col("df"), lit(0L)).as("df"), col("tf"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(
            struct(col("df"), col("w"), col("tf")))).as("ts"),
          sum(col("tf")).as("sw"))
    val dtOld = docTok(tfOld).persist(sl); dtOld.count()
    val dtNew = docTok(tfNew).persist(sl); dtNew.count()
    def rowsOf(dt: DataFrame): DataFrame =
      dt.select(col("doc_id"), col("sw"),
          posexplode(col("ts")).as(Seq("p0", "pt")))
        .withColumn("suffw", col("sw") - sum(col("pt.tf")).over(
          Window.partitionBy(col("doc_id")).orderBy(col("p0")))
          + col("pt.tf"))
        .select(col("doc_id"), col("sw"), col("suffw"),
          col("pt.w").as("w"))
    // one (doc, token) weight and one weight sum per doc even under
    // replay: a replayed document sits in both relations with the same
    // text, hence identical tf rows — duplicates would double m AND sw
    val tfAll = tfNew.unionByName(tfOld).dropDuplicates("doc_id", "w")
    val sums = dtNew.unionByName(dtOld).dropDuplicates("doc_id")
      .select(col("doc_id"), col("sw"))
    WeightedSides(rowsOf(dtNew), rowsOf(dtOld), tfAll, sums)
  }

  /** Incremental (batch-vs-index) face of
    * [[weightedSetSimilarityPairs]]: every pair (new, old) and (new,
    * new) with weighted Jaccard Σ min(tf) / Σ max(tf) ≥ `threshold`;
    * the old corpus is never self-joined. Both sides keep the standard
    * weighted prefix (positions whose suffix weight ≥ t·S — the pair
    * roles are new/old, which do not align with the size order an
    * asymmetric prefix needs, exactly the [[setSimilarityIncremental]]
    * posture); the weighted length and positional filters are
    * pair-local consequences of J_w ≥ t and apply unchanged. Verify is
    * the exploded shared-token join over the replay-deduped tf
    * relation — candidate-sized.
    */
  def weightedSetSimilarityIncremental(corpus: DataFrame, batch: DataFrame,
                                       idCol: String, threshold: Double,
                                       textCol: String = "text", k: Int = 1,
                                       maxBucketSize: Int = 0): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val eps = 1e-9
    val ws = weightedIncrementalRows(corpus, batch, idCol, textCol, k)
    def pref(r: DataFrame) = r.filter(col("suffw").cast("double") >=
      lit(threshold) * col("sw") - lit(eps))
    val (pn, po) = capBucketsPaired(pref(ws.rowsNew), pref(ws.rowsOld),
      Seq("w"), maxBucketSize, "weightedSetSimilarityIncremental")
    val pnP = pn.persist(sl); pnP.count()
    val alpha = lit(threshold / (1 + threshold)) *
      (col("sa") + col("sb")) - lit(eps)
    def leg(a: DataFrame, b: DataFrame, pred: Column): DataFrame =
      a.select(col("w"), col("doc_id").as("na"), col("sw").as("sa"),
          col("suffw").as("fa"))
        .join(b.select(col("w"), col("doc_id").as("nb"),
          col("sw").as("sb"), col("suffw").as("fb")), Seq("w"))
        .filter(pred)
        // weighted length filter, both directions (pair not size-ordered)
        .filter(col("sa").cast("double") >=
            lit(threshold) * col("sb") - lit(eps) &&
          col("sb").cast("double") >=
            lit(threshold) * col("sa") - lit(eps))
        .groupBy(col("na"), col("nb"))
        .agg(max(least(col("fa"), col("fb"))).as("bound"),
          first(col("sa")).as("sa"), first(col("sb")).as("sb"))
        // positional filter: the best shared-token suffix bound must
        // clear the required shared weight (the first shared token's
        // min(suffw) bounds all of m — see weightedSetSimilarityPairs)
        .filter(col("bound").cast("double") >= alpha)
        .select(col("na"), col("nb"))
    // a REPLAYED document sits in both relations; id inequality excludes
    // the self-pair exactly (ids are unique per document)
    val cand = leg(pnP, po, col("na") =!= col("nb"))
      .unionByName(leg(pnP, pnP, col("na") < col("nb")))
      .select(least(col("na"), col("nb")).as("doc_a"),
        greatest(col("na"), col("nb")).as("doc_b"))
      .distinct()
      .persist(sl)
    cand.count()
    // MERGE-WALK verify (r19, the weightedContainmentIncremental shape):
    // per pair one codegen'd sorted-merge Σ min(tf) instead of the
    // exploded shared-token join; arrays resolved and dropped before
    // the weight-sum joins
    val m = weightedMergeVerify(cand, ws.tfAll, ws.sums,
      "weightedSetSimilarityIncremental")
    val jw = col("m").cast("double") /
      (col("sa") + col("sb") - col("m")).cast("double")
    m.filter(jw >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jw, 6).as("wjaccard"))
  }

  /** Shared merge-walk verify of the weighted families (r19): builds
    * one w-sorted token array + aligned tf array per document from the
    * (replay-deduped) `tf` relation, broadcasts them under the byte
    * guard, and resolves `m = Σ min(tf_a, tf_b)` per candidate pair
    * with ONE codegen'd sorted-merge ([[graft.functions
    * .WeightedMinOverlap]]) — the verify is candidate-ROW-bound, never
    * candidate × doc-length. The arrays are dropped before the weight
    * sums join on, so no shuffle carries array payloads. Returns
    * (doc_a, doc_b, m, sa, sb).
    *
    * The broadcast is priced from the DATA, not a flat per-doc
    * constant (ADVICE r19): the (ws, tfs) payload scales with distinct
    * grams per document, so one aggregate over the already-persisted
    * tf relation sums actual token bytes — Σ(len(w) + ~32 B
    * offsets/tf-slot) per entry plus ~96 B per-doc row/hash-entry
    * overhead. A corpus of long documents that a flat 4 KiB/doc
    * estimate would under-price 10×+ now correctly falls back to the
    * shuffle join before the driver OOMs or Spark's 8 GB broadcast
    * limit fails the job.
    */
  private def weightedMergeVerify(cand: DataFrame, tf: DataFrame,
                                  sums: DataFrame,
                                  label: String): DataFrame = {
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docArrs = tf.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("w"), col("tf"))))
        .as("wt"))
      .select(col("doc_id"),
        expr("transform(wt, x -> x.w)").as("ws"),
        expr("transform(wt, x -> x.tf)").as("tfs"))
      .persist(sl)
    // the materializing pass doubles as the sizing pass: the agg that
    // would have been a bare count() also sums actual token bytes
    // (~32 B/slot covers the tf long + array offsets; ~96 B/doc covers
    // the id + row + hash-entry overhead) — zero extra jobs, no second
    // scan of the tf lineage. Token bytes via octet_length(concat_ws)
    // — OCTET, not char (ADVICE r20): length() counts CHARACTERS, which
    // under-prices multi-byte UTF-8 corpora (CJK, Cyrillic) up to 4x —
    // + 32*size, NOT a higher-order aggregate: HOFs evaluate interpreted
    // (per-element lambda dispatch), measured ~0.5 s over a 60k-doc
    // corpus where this codegen'd form is free
    val stats = docArrs.agg(count(lit(1)).as("n"),
      coalesce(sum(octet_length(concat_ws("", col("ws"))).cast("long") +
        lit(32L) * size(col("ws"))), lit(0L)).as("b")).head()
    val nDocs = stats.getLong(0)
    val estBytes = stats.getLong(1) + nDocs * 96L
    def docSide(aliasId: String, aw: String, atf: String) =
      ForcedBroadcast.orShuffleTotal(
        docArrs.select(col("doc_id").as(aliasId),
          col("ws").as(aw), col("tfs").as(atf)), nDocs, estBytes,
        s"$label verify arrays")
    cand
      .join(docSide("doc_a", "wsa", "tfa"), Seq("doc_a"))
      .join(docSide("doc_b", "wsb", "tfb"), Seq("doc_b"))
      .withColumn("m", call_function("graft_woverlap",
        col("wsa"), col("tfa"), col("wsb"), col("tfb")))
      .drop("wsa", "tfa", "wsb", "tfb")
      .join(sums.select(col("doc_id").as("doc_a"), col("sw").as("sa")),
        Seq("doc_a"))
      .join(sums.select(col("doc_id").as("doc_b"), col("sw").as("sb")),
        Seq("doc_b"))
  }

  /** Incremental (batch-vs-index) face of [[weightedContainmentPairs]]:
    * every pair touching at least one batch document whose larger
    * WEIGHTED containment Σ min(tf) / S_side reaches `threshold`; the
    * old corpus is never self-joined. Two blocking legs, because the
    * CONTAINED side (the smaller-total-weight side — it owns the
    * larger containment) carries the weighted prefix lemma and either
    * side of a cross pair can be the contained one: batch weighted
    * prefixes probe everyone's FULL weighted rows (new-in-old,
    * new-in-new, old-containing-new), old prefixes probe the batch's
    * full rows (old-contained-in-new). Hot-token cap judges combined
    * prefix-side/full-side membership ([[containmentIncremental]]).
    */
  def weightedContainmentIncremental(corpus: DataFrame, batch: DataFrame,
                                     idCol: String, threshold: Double,
                                     textCol: String = "text", k: Int = 1,
                                     maxBucketSize: Int = 0): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val eps = 1e-9
    val ws = weightedIncrementalRows(corpus, batch, idCol, textCol, k)
    def tag(r: DataFrame, t: Int) = r.withColumn("__new", lit(t))
    def pref(r: DataFrame) = r.filter(col("suffw").cast("double") >=
      lit(threshold) * col("sw") - lit(eps))
    val pfx = tag(pref(ws.rowsNew), 1).unionByName(tag(pref(ws.rowsOld), 0))
    val full = tag(ws.rowsNew, 1).unionByName(tag(ws.rowsOld, 0))
    val (pc, fc) = capBucketsPaired(pfx, full, Seq("w"), maxBucketSize,
      "weightedContainmentIncremental")
    val pcP = pc.persist(sl); pcP.count()
    val fcP = fc.persist(sl); fcP.count()
    def leg(a: DataFrame, b: DataFrame): DataFrame =
      a.select(col("w"), col("doc_id").as("na"), col("sw").as("sa"),
          col("suffw").as("fa"))
        .join(b.select(col("w"), col("doc_id").as("nb"),
          col("sw").as("sb"), col("suffw").as("fb")), Seq("w"))
        .filter(col("na") =!= col("nb"))
        .groupBy(col("na"), col("nb"))
        .agg(max(least(col("fa"), col("fb"))).as("bound"),
          first(col("sa")).as("sa"), first(col("sb")).as("sb"))
        .filter(col("bound").cast("double") >=
          lit(threshold) * least(col("sa"), col("sb")) - lit(eps))
        .select(col("na"), col("nb"))
    val cand = leg(pcP.filter(col("__new") === 1), fcP)
      .unionByName(leg(pcP.filter(col("__new") === 0),
        fcP.filter(col("__new") === 1)))
      .select(least(col("na"), col("nb")).as("doc_a"),
        greatest(col("na"), col("nb")).as("doc_b"))
      .distinct()
      .persist(sl)
    cand.count()
    // MERGE-WALK verify over the replay-deduped tf relation (r19 —
    // the batch face's shape: containment candidates are false-
    // positive-heavy by nature, so verify must be candidate-row-bound)
    val m = weightedMergeVerify(cand, ws.tfAll, ws.sums,
      "weightedContainmentIncremental")
    val jw = col("m").cast("double") /
      (col("sa") + col("sb") - col("m")).cast("double")
    val ca = col("m").cast("double") / col("sa")
    val cb = col("m").cast("double") / col("sb")
    m.filter(greatest(ca, cb) >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jw, 6).as("wjaccard"),
        round(ca, 6).as("wcont_a_in_b"), round(cb, 6).as("wcont_b_in_a"))
  }

  /** Incremental (batch-vs-index) face of [[containmentSelfPairs]] —
    * the containment analogue of [[setSimilarityIncremental]]: every
    * pair touching at least one batch document whose larger containment
    * reaches `threshold`; the old corpus is never self-joined. Two
    * blocking legs, because the CONTAINED side owns the prefix lemma
    * and either side of a cross pair can be the contained one: batch
    * prefixes probe the full token sets of everything (covering new-in-
    * old, new-in-new, and old-CONTAINING-new via symmetry of the pair),
    * and old prefixes probe the batch's full tokens (old-contained-in-
    * new). Vocabulary order pinned to corpus-only document frequencies
    * (any total order satisfies the lemma — the
    * [[setSimilarityIncremental]] contract); the hot-token cap judges
    * combined prefix-side/full-side membership per token.
    */
  def containmentIncremental(corpus: DataFrame, batch: DataFrame,
                             idCol: String, threshold: Double,
                             textCol: String = "text", k: Int = 3,
                             maxBucketSize: Int = 0): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val eps = 1e-9
    def shingles(d: DataFrame) =
      shingleRows(d.select(col(idCol), col(textCol)), idCol, textCol, k)
        .select(col("doc_id"), col("s").as("w")).distinct()
    val tkOld = shingles(corpus).persist(sl); tkOld.count()
    val tkNew = shingles(batch).persist(sl); tkNew.count()
    val dfreq = tkOld.groupBy(col("w")).agg(count(lit(1)).as("df"))
    def docTok(tk: DataFrame): DataFrame =
      tk.join(dfreq, Seq("w"), "left")
        .select(col("doc_id"), col("w"),
          coalesce(col("df"), lit(0L)).as("df"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("ts"))
        .withColumn("s", size(col("ts")))
        .withColumn("p",
          col("s") -
            ceil(lit(threshold) * col("s") - lit(eps)).cast("int") + 1)
    val dtOld = docTok(tkOld).persist(sl); dtOld.count()
    val dtNew = docTok(tkNew).persist(sl); dtNew.count()
    def rowsOf(dt: DataFrame, lenCol: Column, tag: Int): DataFrame =
      dt.select(col("doc_id"), col("s"),
          posexplode(slice(col("ts"), lit(1), lenCol)).as(Seq("p0", "pt")))
        .select(col("doc_id"), col("s"), (col("p0") + 1).as("pos"),
          col("pt.w").as("w"), lit(tag).as("__new"))
    // cap on COMBINED membership: the join is prefix-side x full-side
    val pfx = rowsOf(dtNew, col("p"), 1)
      .unionByName(rowsOf(dtOld, col("p"), 0))
    val full = rowsOf(dtNew, col("s"), 1)
      .unionByName(rowsOf(dtOld, col("s"), 0))
    val (pc, fc) = capBucketsPaired(pfx, full, Seq("w"), maxBucketSize,
      "containmentIncremental")
    val pcP = pc.persist(sl); pcP.count()
    val fcP = fc.persist(sl); fcP.count()
    def leg(a: DataFrame, b: DataFrame): DataFrame =
      a.select(col("w"), col("doc_id").as("na"), col("s").as("sa"),
          col("pos").as("ia"))
        .join(b.select(col("w"), col("doc_id").as("nb"), col("s").as("sb"),
          col("pos").as("ib")), Seq("w"))
        .filter(col("na") =!= col("nb"))
        .groupBy(col("na"), col("nb"))
        .agg(min(struct(col("ia"), col("ib"))).as("m"),
          first(col("sa")).as("sa"), first(col("sb")).as("sb"))
        .filter(lit(1) +
          least(col("sa") - col("m.ia"), col("sb") - col("m.ib")) >=
          ceil(lit(threshold) * least(col("sa"), col("sb")) - lit(eps)))
        .select(col("na"), col("nb"))
    val cand = leg(pcP.filter(col("__new") === 1), fcP)
      .unionByName(leg(pcP.filter(col("__new") === 0),
        fcP.filter(col("__new") === 1)))
      .select(least(col("na"), col("nb")).as("doc_a"),
        greatest(col("na"), col("nb")).as("doc_b"))
      .distinct()
      .persist(sl)
    cand.count()
    // one sorted-token row per doc even under replay (same text -> same
    // ts on either side)
    val arr = dtNew.unionByName(dtOld).dropDuplicates("doc_id")
      .select(col("doc_id"),
        transform(col("ts"), x => x.getField("w")).as("ws"), col("s"))
    val withArrays = cand
      .join(arr.select(col("doc_id").as("doc_a"), col("ws").as("wa"),
        col("s").as("sa")), Seq("doc_a"))
      .join(arr.select(col("doc_id").as("doc_b"), col("ws").as("wb"),
        col("s").as("sb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("wa"), col("wb"))))
    val jac = col("inter").cast("double") /
      (col("sa") + col("sb") - col("inter")).cast("double")
    val ca = col("inter").cast("double") / col("sa")
    val cb = col("inter").cast("double") / col("sb")
    withArrays
      .filter(greatest(ca, cb) >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"),
        round(ca, 6).as("cont_a_in_b"), round(cb, 6).as("cont_b_in_a"),
        (greatest(ca, cb) >= 0.8 && jac < 0.5).cast("int").as("quote_like"))
  }

  /** Connected-component resolution over verified near-dup PAIRS — the
    * step that turns a pair report into a dedup operator: A~B and B~C put
    * all three in one cluster whose keeper is the minimum doc id.
    * Returns (node, label) where label is the cluster keeper.
    *
    * Algorithm: min-label propagation WITH pointer jumping. Every node
    * starts labeled with itself; each round a node takes the min of its
    * own label, its neighbors' labels, and its label's label (the jump —
    * classic pointer doubling), so convergence is O(log diameter) rounds
    * instead of O(diameter): a 1000-long near-dup chain resolves in ~10
    * rounds, not 1000. Deterministic: no randomness, min is
    * order-insensitive.
    *
    * Scale posture: state is one (node, label) row per document THAT
    * APPEARS IN A PAIR (candidate-sized, not corpus-sized); each round is
    * two equi-joins + one partial-agg shuffle on that relation.
    *
    * Lineage control: the input and every round's labels are cut with
    * `localCheckpoint` (eager). Without the cut, round N's logical plan
    * embeds the FULL upstream pipeline (LSH + verification) N times over —
    * Catalyst re-analyzes and re-canonicalizes those trees on every round,
    * which measured 10x slower than the actual 500-row joins at sf0.1.
    * Checkpointed blocks are reference-counted by the ContextCleaner and
    * freed when the returned plan is garbage-collected, so repeated calls
    * do not accumulate cached relations (unlike `persist`, there is no
    * cache-manager entry to leak). On a multi-executor cluster, flip to
    * reliable `checkpoint()` (HDFS-backed) if executor loss during the
    * short resolution phase must be survivable — the algorithm is
    * unchanged.
    */
  def resolveClusters(pairs: DataFrame, maxRounds: Int = 64): DataFrame = {
    val p = pairs.localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      require(rounds <= maxRounds,
        s"label propagation did not converge in $maxRounds rounds")
      val neighborMin = edges.join(labels, col("dst") === col("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      val stepped = labels.join(neighborMin, col("node") === col("src"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("l1"))
      // pointer jump: follow the candidate label to ITS current label and
      // take the min — label(v) stays inside v's component (it is always
      // some member's id), so the fixed point is still the component min
      val dict = labels.select(col("node").as("dn"), col("label").as("dl"))
      val next = stepped.join(dict, col("l1") === col("dn"), "left")
        .select(col("node"), col("old"),
          least(col("l1"), coalesce(col("dl"), col("l1"))).as("label"))
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select(col("node"), col("label"))
    }
    labels
  }

  /** The deduplicated corpus after fuzzy matching: drop every non-keeper
    * member of each verified near-dup cluster — the fuzzy counterpart of
    * [[exactKeepFirst]]. Anti-join is dropped-set-sized, corpus scanned once.
    */
  def fuzzyKeepFirst(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val dropped = resolveClusters(pairs)
      .filter(col("node") =!= col("label")).select(col("node"))
    docs.join(dropped, docs(idCol) === dropped("node"), "left_anti")
  }

  /** [[fuzzyKeepFirst]] with a QUALITY-AWARE keeper policy: per resolved
    * cluster, keep the member with the highest `score` (ties break on
    * lowest id) instead of the lowest id. This is the policy real
    * curation pipelines run — when a page was crawled five slightly-
    * different times, keep the longest / highest-quality capture, not
    * the one that happened to get the smallest id. `score` is any
    * deterministic Column over the doc row (document length, a Gopher
    * quality signal, a classifier score), so the keeper rule composes
    * with every scorer in the library.
    *
    * Shuffle shape: scores are joined onto the RESOLVED membership
    * relation (candidate-sized, not corpus-sized), the per-cluster
    * argmax is one window over it, and the corpus pays a single
    * dropped-set anti-join — identical cost profile to keep-first plus
    * one candidate-sized join.
    */
  def fuzzyKeepBest(docs: DataFrame, pairs: DataFrame, idCol: String,
                    score: Column): DataFrame = {
    val members = resolveClusters(pairs)
    val scored = docs.select(col(idCol).as("node"), score.as("__score"))
      .join(members, Seq("node"))
    val rn = row_number().over(Window.partitionBy(col("label"))
      .orderBy(col("__score").desc, col("node")))
    val dropped = scored.withColumn("__rn", rn)
      .filter(col("__rn") =!= 1).select(col("node"))
    docs.join(dropped, docs(idCol) === dropped("node"), "left_anti")
  }

  /** The production near-dup dedup composition: exact-duplicate collapse
    * FIRST, then fuzzy keep-first over the collapsed corpus. A real crawl
    * corpus contains floods of IDENTICAL documents; uncollapsed, every
    * member of a flood lands in the same band bucket and the bucket
    * self-join goes quadratic in the flood size. Collapse makes each
    * flood contribute ONE bucket member (its keeper); `maxBucketSize`
    * remains available as the loud backstop for NEAR-identical floods
    * that survive exact collapse ([[capBuckets]]).
    *
    * Returns the deduplicated corpus: exact keepers minus fuzzy-cluster
    * non-keepers. The collapsed corpus is persisted because the fuzzy
    * phase scans it three times (sketch, verification semi-join, final
    * anti-join); on a real cluster at 100 TB, write it to storage between
    * the phases instead — the composition is unchanged.
    */
  def nearDupKeepFirst(docs: DataFrame, idCol: String, numHashes: Int,
                       bands: Int, threshold: Double,
                       textCol: String = "text", k: Int = 3,
                       maxBucketSize: Int = 0): DataFrame = {
    val collapsed = exactKeepFirst(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    collapsed.count() // serial materialization — see lshCandidatePairs
    fuzzyKeepFirst(collapsed,
      fuzzy(collapsed, idCol, numHashes, bands, threshold, textCol, k,
        maxBucketSize),
      idCol)
  }

  /** [[nearDupKeepFirst]] with the quality-aware keeper rule: the same
    * guarded production composition (exact collapse first, capped fuzzy
    * matching), resolving each near-dup cluster to its BEST member by
    * `score` ([[fuzzyKeepBest]]) instead of its lowest id. Note the
    * exact-collapse stage still keeps the lowest id of each IDENTICAL
    * flood — identical copies are interchangeable, so re-scoring them
    * would only reshuffle equal content.
    */
  def nearDupKeepBest(docs: DataFrame, idCol: String, numHashes: Int,
                      bands: Int, threshold: Double, score: Column,
                      textCol: String = "text", k: Int = 3,
                      maxBucketSize: Int = 0): DataFrame = {
    val collapsed = exactKeepFirst(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    collapsed.count() // serial materialization — see lshCandidatePairs
    fuzzyKeepBest(collapsed,
      fuzzy(collapsed, idCol, numHashes, bands, threshold, textCol, k,
        maxBucketSize),
      idCol, score)
  }

  /** 64-bit tf-weighted SimHash, returned as two 32-bit halves
    * (`simhash_hi`, `simhash_lo`) to stay inside signed-long arithmetic on
    * every engine. Bit i of md5(token) is extracted from its hex digits;
    * the per-bit score is sum(tf * (2*bit - 1)); a positive score sets the
    * bit.
    *
    * Shuffle shape: the 64 per-bit scores are 64 AGGREGATE COLUMNS over
    * the (doc, token, tf) relation — not an exploded (doc, token, bit)
    * relation, which would push 64x the rows through the shuffle. Two
    * doc-keyed shuffles total, each carrying sketch-sized rows.
    *
    * Bit extraction: the md5 hex is parsed ONCE per token into two 32-bit
    * longs (`hh` = hex digits 1-8, `hl` = digits 9-16); bit i is then a
    * single `shiftright + & 1` on the right half. The per-bit formulation
    * (`conv(substring(h, i/4+1, 1))` separately for each of the 64 bits)
    * evaluated 64 substring+conv expression trees per (doc, token) row and
    * made the sketch the most expensive stage of the whole suite. Digit
    * d (1-based) of a hex number occupies bits [4*(8-d), 4*(8-d)+3] of its
    * 32-bit value, so bit i of the digit-wise walk is exactly bit 31-i
    * (resp. 63-i) of `hh` (resp. `hl`) — identical bits, ~64x fewer parses.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = Par.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .withColumn("h", md5(col("w")))
      .withColumn("hh", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
      .withColumn("hl", conv(substring(col("h"), 9, 8), 16, 10).cast("long"))
    def bitScore(i: Int) = {
      val bit =
        if (i < 32) shiftright(col("hh"), 31 - i).bitwiseAND(lit(1L))
        else shiftright(col("hl"), 63 - i).bitwiseAND(lit(1L))
      sum(col("tf") * (bit * 2 - 1)).as(s"s$i")
    }
    val scores = tok.groupBy("doc_id")
      .agg(bitScore(0), (1 until 64).map(bitScore): _*)
    def half(lo: Int, hi: Int, shiftBase: Int) =
      (lo until hi).map(i =>
        when(col(s"s$i") > 0, lit(1L << (shiftBase - i))).otherwise(lit(0L)))
        .reduce(_ + _)
    scores.select(col("doc_id"),
      half(0, 32, 31).as("simhash_hi"),
      half(32, 64, 63).as("simhash_lo"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (<= 3 with
    * the default banding): the 64 bits are cut into four 16-bit blocks; by
    * pigeonhole, any pair within distance 3 matches at least one block
    * exactly, so candidates are found with an equi-join on (block, value)
    * and only candidates pay the popcount.
    */
  /** SimHash pigeonhole band relation (doc_id, simhash_hi, simhash_lo,
    * band, v): the 64 bits cut into four 16-bit blocks. This is the unit
    * an ingestion pipeline PERSISTS as the corpus index — self-joined by
    * [[simhashPairs]], joined batch-vs-index by
    * [[incrementalSimhashPairs]].
    */
  def simhashBandIndex(sketches: DataFrame): DataFrame =
    sketches.select(col("doc_id"), col("simhash_hi"), col("simhash_lo"),
      posexplode(array(
        shiftright(col("simhash_hi"), 16), col("simhash_hi").bitwiseAND(lit(65535L)),
        shiftright(col("simhash_lo"), 16), col("simhash_lo").bitwiseAND(lit(65535L))))
        .as(Seq("band", "v")))

  def simhashPairs(sketches: DataFrame, maxHamming: Int,
                   maxBucketSize: Int = 0): DataFrame = {
    // pigeonhole guarantee: 4 bands of 16 bits find every pair only up to
    // distance 3 (one band must match exactly) — larger thresholds would
    // silently lose recall, so reject them
    require(maxHamming <= 3,
      s"4x16-bit banding guarantees recall only for maxHamming <= 3 (got $maxHamming)")
    // persist: sketch-sized (4 rows/doc); read once by both join sides
    val banded0 = simhashBandIndex(sketches)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded0.count() // serial materialization — see lshCandidatePairs
    val banded = capBuckets(banded0, Seq("band", "v"), maxBucketSize,
      "simhashPairs")
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash_hi").as("ha"), col("a.simhash_lo").as("la"),
        col("b.simhash_hi").as("hb"), col("b.simhash_lo").as("lb"))
      .distinct()
    val dist = bit_count(col("ha").bitwiseXOR(col("hb"))) +
      bit_count(col("la").bitwiseXOR(col("lb")))
    cand.filter(dist <= maxHamming)
      .select(col("doc_a"), col("doc_b"), dist.cast("int").as("hamming"))
  }

  /** Incremental-ingestion SimHash pairs: Hamming near-dups for a NEW
    * batch of sketches against an already-ingested corpus index, plus
    * within the batch — the old corpus is never self-joined (same shape
    * as [[incrementalLshCandidates]], for the other sketch family). The
    * corpus side is the persisted [[simhashBandIndex]] in production;
    * here it is recomputed from `corpusSketches`. Equals
    * `simhashPairs(corpus union batch)` restricted to pairs touching the
    * batch, in canonical (min, max) id order.
    */
  def incrementalSimhashPairs(corpusSketches: DataFrame,
                              batchSketches: DataFrame,
                              maxHamming: Int,
                              maxBucketSize: Int = 0): DataFrame = {
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bOld = simhashBandIndex(corpusSketches).persist(sl)
    bOld.count() // serial materialization — see lshCandidatePairs
    val bNew = simhashBandIndex(batchSketches).persist(sl)
    bNew.count()
    // eager candidate-sized materialization + cache release — the
    // per-ingest path must not accumulate cached band relations
    val result = incrementalSimhashPairsIndexed(bOld, bNew, maxHamming,
      maxBucketSize).localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    bOld.unpersist()
    bNew.unpersist()
    result
  }

  /** [[incrementalSimhashPairs]] over PREBUILT band relations
    * ([[simhashBandIndex]] rows — what a stored index actually is, so the
    * streaming ingester joins the parquet index directly instead of
    * re-banding it). Lazy: the caller owns materialization and cache
    * lifecycle.
    */
  def incrementalSimhashPairsIndexed(bOld: DataFrame, bNew: DataFrame,
                                     maxHamming: Int,
                                     maxBucketSize: Int = 0): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit banding guarantees recall only for maxHamming <= 3 (got $maxHamming)")
    val (pOld, pNew) = capBucketsPaired(bOld, bNew, Seq("band", "v"),
      maxBucketSize, "incrementalSimhashPairs")
    val onBand = col("a.band") === col("b.band") && col("a.v") === col("b.v")
    def pairCols = Seq(
      least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
      greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
      col("a.simhash_hi").as("ha"), col("a.simhash_lo").as("la"),
      col("b.simhash_hi").as("hb"), col("b.simhash_lo").as("lb"))
    val cross = pNew.as("a").join(pOld.as("b"),
      onBand && col("a.doc_id") =!= col("b.doc_id")).select(pairCols: _*)
    val intra = pNew.as("a").join(pNew.as("b"),
      onBand && col("a.doc_id") < col("b.doc_id")).select(pairCols: _*)
    val cand = cross.union(intra).distinct()
    val dist = bit_count(col("ha").bitwiseXOR(col("hb"))) +
      bit_count(col("la").bitwiseXOR(col("lb")))
    cand.filter(dist <= maxHamming)
      .select(col("doc_a"), col("doc_b"), dist.cast("int").as("hamming"))
  }
}
