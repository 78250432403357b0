package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Corpus-level layout operators for training-data prep — the steps that
  * come AFTER per-document analysis ([[TextAnalysis]]) and deduplication
  * ([[Dedup]]) in a real pretraining pipeline:
  *
  *  - deterministic shuffle-sharding (the final training-data layout:
  *    a reproducible global permutation bucketed into shards),
  *  - whitespace/control-char text normalization,
  *  - corpus vocabulary (token totals + document frequency, Expand-free).
  *
  * Benchmark decontamination lives in [[TextAnalysis.decontaminate]] (with
  * its indexed/streaming faces); per-source caps are
  * [[Dedup.stratifiedSample]]. All operators here are engine-reproducible
  * (md5-derived ordering/hashes, no RNG) so the DuckDB oracles replay them
  * exactly.
  */
object Corpus {

  // ---- Deterministic shuffle-sharding ------------------------------

  /** Reproducible global shuffle + sharding — the final layout step of a
    * pretraining corpus: every document gets a pseudo-random 60-bit key
    * (first 15 hex digits of md5(id), the same hex→long convention as
    * the MinHash family), a shard = key mod `nShards`, and a position
    * within its shard (key order, id tie-break). Reruns produce the
    * identical permutation on any engine — no RNG, no partition-count
    * dependence.
    *
    * Scale shape: the window is PARTITIONED by shard — one independent
    * sort per shard, no global ordering. The physical write would
    * `repartitionByRange($"shard")` + `sortWithinPartitions` and stream
    * each shard file; position assignment here is the same computation.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val key = conv(substring(md5(col(idCol).cast(StringType)), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("shuffle_key"), col(idCol))
    df.select(col(idCol))
      .withColumn("shuffle_key", key)
      .withColumn("shard", (col("shuffle_key") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
  }

  /** Curriculum ordering: the GLOBAL training order that presents
    * tier 1 (lowest quality quartile) first and tier 4 last, with a
    * deterministic md5 shuffle WITHIN each tier — the quality-ramp
    * schedule over [[TextAnalysis.qualityTiers]]' output (any
    * `(idCol, tier)` relation works).
    *
    * The global position is assigned WITHOUT a global sort — the
    * `row_number() OVER (ORDER BY tier, key)` formulation funnels the
    * corpus through one task. Instead: 256 order-preserving range
    * buckets over the 60-bit shuffle key (top 8 bits, monotone in the
    * key), per-(tier, bucket) counts roll into broadcast cumulative
    * offsets, and each bucket sorts independently — the same
    * distributed-rank shape as [[DataProfile.equiDepthHistogram]].
    * Deterministic: md5 keys, integer offsets, total (tier, key, id)
    * order.
    */
  def curriculum(tiers: DataFrame, idCol: String): DataFrame = {
    val key = conv(substring(md5(col(idCol).cast(StringType)), 1, 15), 16, 10)
      .cast("long")
    val base = tiers.select(col(idCol), col("tier"))
      .withColumn("shuffle_key", key)
      .withColumn("__b", shiftright(col("shuffle_key"), 52).cast("int"))
    val offsets = base
      .groupBy(col("tier").as("__t"), col("__b").as("__bb"))
      .agg(count(lit(1)).as("__n"))
      // at most 4 tiers x 256 buckets — the unpartitioned window is
      // bounded by the bucket grid, not the corpus
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__t"), col("__bb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__t"), col("__bb"), col("__off"))
    val within = Window.partitionBy(col("tier"), col("__b"))
      .orderBy(col("shuffle_key"), col(idCol))
    base.join(broadcast(offsets),
        col("tier") === col("__t") && col("__b") === col("__bb"))
      .withColumn("position", col("__off") + row_number().over(within))
      .select(col(idCol), col("tier"), col("shuffle_key"), col("position"))
  }

  // ---- Text normalization ------------------------------------------

  /** Whitespace/control normalization for raw crawl text: lowercase,
    * map every whitespace/control run (tab, LF, CR, VT, FF, NUL..US) to
    * a single space, trim. Map-only, one codegen'd projection; the
    * regexes are RE2-compatible so the oracle replays them. Emits the
    * normalized text and its length (the post-normalization `n_chars`
    * downstream operators would consume).
    */
  def normalize(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val collapsed = regexp_replace(lower(col(textCol)),
      "[\\x00-\\x20]+", " ")
    val norm = trim(collapsed)
    df.select(col(idCol), norm.as("norm_text"),
      length(norm).as("n_chars_norm"))
  }

  // ---- Corpus vocabulary -------------------------------------------

  /** Top-`topN` corpus vocabulary: per token, total occurrences and
    * document frequency, ordered by total desc (token tie-break — a
    * total order, so the cutoff is deterministic).
    *
    * Scale shape: two-level aggregation — (doc, token) counts first
    * (map-side partials collapse within-document repeats), then a
    * token-level rollup where `n_docs` is a plain `count(*)`, NOT
    * `countDistinct` — no Expand, half the shuffle. The final top-N is
    * TakeOrderedAndProject: each partition keeps N rows, the driver
    * merges N-sized heaps — no global sort.
    */
  def vocab(df: DataFrame, idCol: String, textCol: String,
            topN: Int): DataFrame =
    Par.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy("token")
      .agg(sum("c").as("n_total"), count(lit(1)).cast("int").as("n_docs"))
      .orderBy(col("n_total").desc, col("token"))
      .limit(topN)

  // ---- Train/val/test split ----------------------------------------

  /** Deterministic train/val/test assignment: the md5 id bucket (0-99,
    * [[graft.ops.Dedup.hashBucket]]) partitions the corpus into
    * `val` (< valPct), `test` (next testPct) and `train` (the rest) —
    * the split every training run needs, reproducible across engines,
    * reruns and corpus growth (a document's split never changes when
    * other documents arrive, unlike positional splits). Map-only.
    */
  def trainValTestSplit(df: DataFrame, idCol: String, valPct: Int,
                        testPct: Int): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100)
    val b = graft.ops.Dedup.hashBucket(col(idCol))
    df.withColumn("split",
      when(b < valPct, "val")
        .when(b < valPct + testPct, "test")
        .otherwise("train"))
  }

  /** Split-leakage report: evaluation documents (val/test) whose exact
    * content also appears in the training split — the eval-integrity
    * check every benchmark-bearing corpus needs (hash splits assign by
    * ID, so DUPLICATED CONTENT lands on both sides and silently
    * inflates eval scores). Per leaked eval doc: its split, how many
    * training twins, and the first twin id. Both sides reduce to
    * (id, md5, split) map-side; the join is hash-keyed fixed-width —
    * the [[releaseDiff]] cost shape.
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   valPct: Int, testPct: Int): DataFrame = {
    val s = trainValTestSplit(df, idCol, valPct, testPct)
      .select(col(idCol), md5(lower(col(textCol))).as("__h"), col("split"))
    val train = s.filter(col("split") === "train")
      .select(col("__h"), col(idCol).as("train_id"))
    val eval = s.filter(col("split") =!= "train")
      .select(col("__h"), col(idCol).as("eval_id"), col("split"))
    eval.join(train, Seq("__h"))
      .groupBy(col("eval_id"), col("split"))
      .agg(count(lit(1)).as("n_train_dups"),
        min(col("train_id")).as("first_train_dup"))
  }

  // ---- Release diff ------------------------------------------------

  /** Content diff between two corpus releases: per document id, whether
    * it was `added`, `removed`, `changed` (present in both, content hash
    * differs) or `unchanged` — the audit a data team runs before
    * shipping release N ("what actually moved since N-1, and does the
    * volume match the changelog").
    *
    * Scale shape: both sides reduce to (id, md5) projections map-side —
    * the text never shuffles — then one id-keyed full-outer hash join
    * over fixed-width rows. At 100 TB this is the cheapest possible
    * corpus comparison: two scans, one 48-byte-row shuffle.
    */
  def releaseDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  textCol: String = "text"): DataFrame = {
    val o = oldDf.select(col(idCol).as("__ido"), md5(col(textCol)).as("__ho"))
    val n = newDf.select(col(idCol).as("__idn"), md5(col(textCol)).as("__hn"))
    o.join(n, col("__ido") === col("__idn"), "full_outer")
      .select(coalesce(col("__ido"), col("__idn")).as(idCol),
        when(col("__ido").isNull, "added")
          .when(col("__idn").isNull, "removed")
          .when(col("__ho") === col("__hn"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Set-level overlap between two releases' CONTENT (distinct text
    * hashes, so duplicates count once): intersection size, exact
    * Jaccard, and both containments — the one-row audit that says "the
    * new release is 96% the old one plus 4% fresh" without a per-doc
    * diff. Both sides reduce to distinct-hash sets map-side; one
    * hash-keyed join of fixed-width rows; single-row output.
    */
  def releaseOverlap(oldDf: DataFrame, newDf: DataFrame,
                     textCol: String = "text"): DataFrame = {
    def hashes(df: DataFrame) =
      df.select(md5(col(textCol)).as("__h")).distinct()
    val o = hashes(oldDf)
    val n = hashes(newDf).select(col("__h").as("__hn"))
    val inter = o.join(n, col("__h") === col("__hn"))
      .agg(count(lit(1)).as("n_common"))
    o.agg(count(lit(1)).as("n_old")).crossJoin(
        n.agg(count(lit(1)).as("n_new")))
      .crossJoin(broadcast(inter))
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("n_old") + col("n_new") - col("n_common")), 6))
      .withColumn("containment_old",
        round(col("n_common").cast("double") / col("n_old"), 6))
      .withColumn("containment_new",
        round(col("n_common").cast("double") / col("n_new"), 6))
  }

  /** Shard manifest with content checksums — the integrity artifact a
    * release ships: per shard, its document count, byte total, and a
    * deterministic checksum (md5 over the id-ordered concatenation of
    * member content hashes). Two corpora with the same manifest are
    * byte-identical per shard; a single flipped document flips its
    * shard's checksum. Per-doc hashes compute map-side (text never
    * shuffles); the per-shard fold is one shard-keyed aggregation.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    nShards: Int): DataFrame =
    shardManifestBy(withShard(df, idCol, nShards), "shard", idCol, textCol)

  /** The deterministic shard assignment [[shardManifest]] rides:
    * 60 md5 bits of the id, mod `nShards`.
    */
  def withShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val key = conv(substring(md5(col(idCol).cast(StringType)), 1, 15), 16, 10)
      .cast("long")
    df.withColumn("shard", (key % nShards).cast("int"))
  }

  /** [[shardManifest]] over a PRE-ASSIGNED shard column — the face the
    * publish/read-back verifier uses, where the shard must be whatever
    * was physically written, not recomputed.
    */
  def shardManifestBy(df: DataFrame, shardCol: String, idCol: String,
                      textCol: String): DataFrame =
    df.select(col(shardCol).cast("int").as("shard"), col(idCol),
        md5(col(textCol)).as("__h"),
        length(col(textCol)).cast("long").as("__len"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__len")).as("n_chars"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(struct(col(idCol), col("__h")))),
            x => x.getField("__h")))).as("checksum"))

  /** Release-publish capstone — the LLM-corpus analogue of the ETL
    * pipeline's gold write + read-back verification
    * ([[graft.pipeline.Pipeline]]): physically write the release as a
    * shard-partitioned Parquet table (atomic tmp-dir swap, so readers
    * never see a half release), read it BACK from disk, recompute the
    * per-shard manifest from the read-back bytes, and compare checksums
    * against the manifest planned from the in-memory release. Returns
    * one row per shard with both checksums and `readback_match` — an
    * all-true column is the publish contract; any storage-layer
    * corruption, dropped row, or encoding drift flips its shard red.
    *
    * Scale posture: the write is partitioned by the 60-bit-md5 shard
    * key (uniform by construction — no hot output file); both manifests
    * reduce text to (id, md5) map-side, so verification shuffles
    * fixed-width rows only, never the corpus text.
    */
  def publishRelease(release: DataFrame, idCol: String, textCol: String,
                     nShards: Int, outDir: String): DataFrame = {
    val sharded = withShard(release.select(col(idCol), col(textCol)),
      idCol, nShards)
    graft.pipeline.Pipeline.atomicOverwrite(release.sparkSession, sharded,
      outDir, partitionBy = Seq("shard"))
    verifyPublished(release, idCol, textCol, nShards, outDir)
  }

  /** The verification half of [[publishRelease]], standalone — re-run it
    * any time after the write (a periodic integrity audit of a published
    * release): recompute the manifest from what is ON DISK and compare
    * against the manifest the release plans to. Writes nothing.
    */
  def verifyPublished(release: DataFrame, idCol: String, textCol: String,
                      nShards: Int, outDir: String): DataFrame = {
    val sharded = withShard(release.select(col(idCol), col(textCol)),
      idCol, nShards)
    val planned = shardManifestBy(sharded, "shard", idCol, textCol)
      .select(col("shard"), col("n_docs"), col("n_chars"), col("checksum"))
    val back = shardManifestBy(
      release.sparkSession.read.parquet(outDir), "shard", idCol, textCol)
      .select(col("shard"), col("n_docs").as("__rb_docs"),
        col("n_chars").as("__rb_chars"), col("checksum").as("rb_checksum"))
    planned.join(back, Seq("shard"), "full_outer")
      .select(col("shard"), col("n_docs"), col("n_chars"), col("checksum"),
        col("rb_checksum"),
        coalesce(col("checksum") === col("rb_checksum") &&
          col("n_docs") === col("__rb_docs") &&
          col("n_chars") === col("__rb_chars"), lit(false))
          .as("readback_match"))
  }

  /** [[publishRelease]] routed through the transaction log
    * ([[graft.pipeline.VersionedTable]]) — the release root becomes a
    * versioned table where every publish is a manifest COMMIT: a bad
    * publish is undone by a metadata [[graft.pipeline.VersionedTable.rollback]]
    * (O(1), no data rewritten — the atomic-swap publish would need the
    * whole release re-written), past releases stay readable by version
    * number (time travel for reproducing an old training run), and
    * crashed writers leave the previous release intact. Returns the
    * same per-shard readback-verification report, recomputed from the
    * table's HEAD as the manifest resolves it.
    */
  def publishReleaseVersioned(release: DataFrame, idCol: String,
                              textCol: String, nShards: Int,
                              root: String): DataFrame = {
    val sharded = withShard(release.select(col(idCol), col(textCol)),
      idCol, nShards)
    graft.pipeline.VersionedTable.commit(release.sparkSession, sharded, root)
    verifyPublishedVersioned(release, idCol, textCol, nShards, root)
  }

  /** The verification half of [[publishReleaseVersioned]], standalone:
    * recompute the manifest from the versioned table's bytes (HEAD, or
    * a time-travel `version`) and compare against the manifest the
    * release plans to. Writes nothing.
    */
  def verifyPublishedVersioned(release: DataFrame, idCol: String,
                               textCol: String, nShards: Int, root: String,
                               version: Option[Long] = None): DataFrame = {
    val sharded = withShard(release.select(col(idCol), col(textCol)),
      idCol, nShards)
    val planned = shardManifestBy(sharded, "shard", idCol, textCol)
      .select(col("shard"), col("n_docs"), col("n_chars"), col("checksum"))
    val back = shardManifestBy(
      graft.pipeline.VersionedTable.read(release.sparkSession, root, version),
      "shard", idCol, textCol)
      .select(col("shard"), col("n_docs").as("__rb_docs"),
        col("n_chars").as("__rb_chars"), col("checksum").as("rb_checksum"))
    planned.join(back, Seq("shard"), "full_outer")
      .select(col("shard"), col("n_docs"), col("n_chars"), col("checksum"),
        col("rb_checksum"),
        coalesce(col("checksum") === col("rb_checksum") &&
          col("n_docs") === col("__rb_docs") &&
          col("n_chars") === col("__rb_chars"), lit(false))
          .as("readback_match"))
  }

  /** Vocabulary drift between two corpus releases — the token-level
    * companion of [[releaseDiff]]: for each token, its relative
    * frequency in the old and new corpus and the (6-grid) frequency
    * delta, returning the `topN` largest movers. The drift report is
    * how a data team catches a bad ingest batch (one domain flooding),
    * a scraper regression (boilerplate tokens surging), or a filter
    * change's real footprint — before training on it.
    *
    * Two two-level token aggregations (map-side partials collapse
    * within-document repeats), one token-keyed full-outer join, totals
    * as a broadcast single-row aggregate (never a vocabulary-sized
    * window), TakeOrderedAndProject for the top movers.
    */
  def vocabDrift(oldDf: DataFrame, newDf: DataFrame, textCol: String,
                 topN: Int): DataFrame = {
    def counts(df: DataFrame, cn: String) =
      df.select(explode(split(lower(col(textCol)), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as(cn))
    val j = counts(oldDf, "n_old")
      .join(counts(newDf, "n_new"), Seq("token"), "full_outer")
      .na.fill(0, Seq("n_old", "n_new"))
    val tot = j.agg(sum(col("n_old")).cast("double").as("__to"),
      sum(col("n_new")).cast("double").as("__tn"))
    j.crossJoin(broadcast(tot))
      .withColumn("p_old", round(col("n_old") / col("__to"), 6))
      .withColumn("p_new", round(col("n_new") / col("__tn"), 6))
      .withColumn("drift", round(col("p_new") - col("p_old"), 6))
      .select(col("token"), col("n_old"), col("n_new"),
        col("p_old"), col("p_new"), col("drift"))
      .orderBy(abs(col("drift")).desc, col("token"))
      .limit(topN)
  }

  // ---- Data card ---------------------------------------------------

  /** The per-slice statistics rollup a training-data team publishes with
    * every corpus release (the "data card"): for each (`sourceCol`,
    * `langCol`) slice — document count, distinct-content count and the
    * implied exact-duplication rate, char and whitespace-token totals,
    * doc-length extremes, mean tokens per doc, and the slice's share of
    * all corpus tokens (the number the mixture stage consumes).
    *
    * Scale shape: ONE corpus scan computing map-only per-row signals
    * (length, ws-mode token count via the codegen'd gram expression, an
    * md5 content hash), one slice-keyed aggregation (the distinct-count
    * is over content hashes WITHIN a slice-keyed shuffle — fixed-width
    * keys, no text moves), then a token-share window over the
    * slice-count-sized result — driver-trivial by definition.
    */
  /** [[dataCard]]'s bounded-state face for the distinct counts: exact
    * `countDistinct` shuffles every distinct 16-byte content hash into
    * the slice's aggregation state — corpus-sized for a big slice. This
    * face swaps in `approx_count_distinct` (HyperLogLog++: mergeable
    * partials, state bounded by the relative-standard-deviation knob,
    * not by cardinality) for `n_distinct_texts`/`dup_rate`; everything
    * else is the identical card. The third rung of the distinct-count
    * story: exact batch card / exact-mergeable streaming key sets
    * ([[graft.streaming.StatsIngest]]) / bounded-state sketch (here).
    * [[dataCardSketchAudit]] checks the error bound on a fixture.
    */
  def dataCardSketch(df: DataFrame, sourceCol: String, langCol: String,
                     textCol: String = "text",
                     rsd: Double = 0.05): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val lt = lower(col(textCol))
    val rows = df.select(col(sourceCol), col(langCol),
      length(col(textCol)).cast("long").as("__chars"),
      size(call_function("graft_word_grams", lt, lit(1), lit(false),
        lit(true))).cast("long").as("__toks"),
      md5(lt).as("__h"))
    val g = rows.groupBy(col(sourceCol), col(langCol)).agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(col("__h"), rsd).as("n_distinct_texts"),
      sum(col("__chars")).as("total_chars"),
      sum(col("__toks")).as("total_tokens"),
      min(col("__chars")).as("min_chars"),
      max(col("__chars")).as("max_chars"),
      round(avg(col("__toks")), 6).as("avg_tokens"))
    g.withColumn("dup_rate",
        round(lit(1.0) -
          col("n_distinct_texts").cast("double") / col("n_docs"), 6))
      .withColumn("token_share",
        round(col("total_tokens").cast("double") /
          sum(col("total_tokens")).over(Window.partitionBy()), 6))
  }

  /** Fixture-scale audit of [[dataCardSketch]]'s HLL estimates against
    * the exact counts: per slice, `|approx - exact| <= 4 * rsd * exact`
    * (HLL++ error is ~gaussian with relative std dev `rsd`; 4 sigma
    * absorbs small-cardinality bias, where the sketch is exact anyway).
    * All-true is the contract — a broken sketch flips slices red in the
    * oracle gate.
    */
  def dataCardSketchAudit(df: DataFrame, sourceCol: String,
                          langCol: String, textCol: String = "text",
                          rsd: Double = 0.05): DataFrame = {
    val lt = lower(col(textCol))
    df.select(col(sourceCol), col(langCol), md5(lt).as("__h"))
      .groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__h")).as("__exact"),
        approx_count_distinct(col("__h"), rsd).as("__approx"))
      .select(col(sourceCol), col(langCol), col("n_docs"),
        (abs(col("__approx") - col("__exact")).cast("double") <=
          lit(4 * rsd) * col("__exact").cast("double"))
          .as("distinct_within_tol"))
  }

  def dataCard(df: DataFrame, sourceCol: String, langCol: String,
               textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val lt = lower(col(textCol))
    val rows = df.select(col(sourceCol), col(langCol),
      length(col(textCol)).cast("long").as("__chars"),
      size(call_function("graft_word_grams", lt, lit(1), lit(false),
        lit(true))).cast("long").as("__toks"),
      md5(lt).as("__h"))
    val g = rows.groupBy(col(sourceCol), col(langCol)).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("__h")).as("n_distinct_texts"),
      sum(col("__chars")).as("total_chars"),
      sum(col("__toks")).as("total_tokens"),
      min(col("__chars")).as("min_chars"),
      max(col("__chars")).as("max_chars"),
      round(avg(col("__toks")), 6).as("avg_tokens"))
    g.withColumn("dup_rate",
        round(lit(1.0) -
          col("n_distinct_texts").cast("double") / col("n_docs"), 6))
      .withColumn("token_share",
        round(col("total_tokens").cast("double") /
          sum(col("total_tokens")).over(Window.partitionBy()), 6))
  }
}
