package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Corpus-level curation and layout operators for training-data prep —
  * the steps that come AFTER per-document analysis ([[TextAnalysis]]) and
  * deduplication ([[Dedup]]) in a real pretraining pipeline:
  *
  *  - benchmark decontamination (drop training documents sharing word
  *    k-grams with an evaluation set — the GPT-3/Llama published rule),
  *  - per-source caps (domain balancing: at most N documents per source,
  *    selected by deterministic hash so reruns agree),
  *  - deterministic shuffle-sharding (the final training-data layout:
  *    a reproducible global permutation bucketed into shards),
  *  - whitespace/control-char text normalization,
  *  - corpus vocabulary (token totals + document frequency, Expand-free).
  *
  * All operators are engine-reproducible (md5-derived ordering/hashes,
  * no RNG) so the DuckDB oracles replay them exactly.
  */
object Corpus {

  // ---- Benchmark decontamination -----------------------------------

  /** Distinct word k-grams of the evaluation set — the contamination
    * probe relation. Eval sets are small by definition (benchmarks are
    * human-curated), so downstream joins broadcast this.
    */
  def evalGrams(evalDf: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame =
    Dedup.shingleRows(evalDf, idCol, textCol, k).select("s").distinct()

  /** Contaminated documents: corpus documents sharing at least one word
    * k-gram with the evaluation set, with the count of shared distinct
    * grams (the audit artifact a decontamination run reports).
    *
    * Scale shape: the corpus side is a map-only gram explode (native
    * codegen, per-doc distinct); the eval gram set is BROADCAST — the
    * corpus never shuffles. At 100 TB this runs at scan speed; the only
    * aggregation state is one row per contaminated (doc, ~nothing)
    * group, bounded by the eval set's reach.
    */
  def contaminated(corpus: DataFrame, evalDf: DataFrame, idCol: String,
                   textCol: String, k: Int): DataFrame =
    Dedup.shingleRows(Par.fanOut(corpus.select(col(idCol), col(textCol))),
        idCol, textCol, k)
      .join(broadcast(evalGrams(evalDf, idCol, textCol, k)), "s")
      .groupBy(col("doc_id").as(idCol))
      .agg(count(lit(1)).cast("int").as("n_shared_grams"))

  /** The decontaminated corpus: drop every contaminated document
    * (any-overlap rule, the published standard). The anti-join's right
    * side is the contaminated id set — eval-reach-sized, broadcastable.
    */
  def decontaminate(corpus: DataFrame, evalDf: DataFrame, idCol: String,
                    textCol: String, k: Int): DataFrame =
    corpus.join(
      broadcast(contaminated(corpus, evalDf, idCol, textCol, k)
        .select(idCol)),
      Seq(idCol), "left_anti")

  // ---- Per-source caps (domain balancing) --------------------------

  /** Cap each source at `maxPerSource` documents, selected by
    * deterministic md5 order (id tie-break) — the common-crawl
    * domain-balancing step. Emits the kept rows with their within-source
    * rank.
    *
    * Scale shape: `row_number` bounded by a constant plans as
    * WindowGroupLimit — a PARTIAL top-n runs map-side before the
    * exchange, so the shuffle carries at most `maxPerSource` rows per
    * (source, input partition), never the whole corpus.
    */
  def sourceCap(df: DataFrame, sourceCol: String, idCol: String,
                maxPerSource: Int): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast(StringType)), col(idCol))
    df.select(col(sourceCol), col(idCol))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxPerSource)
  }

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
}
