package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 corpus-prep operators: TF-IDF keyword extraction, benchmark
  * decontamination, and weighted domain mixing.
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  // ---- tfidfTopK -----------------------------------------------------

  private def tfidfDocs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry date")
  ).toDF("doc_id", "text")

  test("tfidf: smoothed scores, rounded-then-ranked, term tie-break") {
    val out = TextAnalysis.tfidfTopK(tfidfDocs, "doc_id", "text", 2)
      .as[(Long, String, Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // N=3; df(apple)=1, df(banana)=2, df(cherry)=2, df(date)=1
    val idf1 = math.log(4.0 / 2) + 1 // df=1
    val idf2 = math.log(4.0 / 3) + 1 // df=2
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out((1L, "apple"))._5 == r6(2 * idf1))
    assert(out((1L, "apple"))._6 == 1)
    assert(out((1L, "banana"))._5 == r6(idf2))
    // d2: banana and cherry tie exactly -> term ascending breaks it
    assert(out((2L, "banana"))._6 == 1 && out((2L, "cherry"))._6 == 2)
    // d3: cherry (tf=2) outranks date despite date's higher idf
    assert(out((3L, "cherry"))._6 == 1 && out((3L, "date"))._6 == 2)
  }

  test("tfidf: k bounds the per-document rows") {
    val out = TextAnalysis.tfidfTopK(tfidfDocs, "doc_id", "text", 1)
    val byDoc = out.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(byDoc.values.forall(_ == 1L) && byDoc.size == 3)
  }

  // ---- decontamination -----------------------------------------------

  private def corpus = Seq(
    (1L, "one two three four five six seven eight nine"),
    (2L, "alpha beta gamma delta"),
    (3L, "x1 x2 x3 x4 x5 x6 x7 x8")
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, "zero one two three four five six seven eight")
  ).toDF("doc_id", "text")

  test("contamination report: only docs sharing an 8-gram, distinct counts") {
    val rep = TextAnalysis.contaminationReport(corpus, bench, "doc_id", "text", 8)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares exactly one 8-gram ("one ... eight"); docs 2 (too
    // short) and 3 (disjoint vocabulary) share none
    assert(rep == Map(1L -> 1L))
  }

  test("decontaminate drops flagged docs, keeps the rest intact") {
    val kept = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text", 8)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // rows pass through unmodified (same schema, same text)
    assert(kept.columns.toSeq == corpus.columns.toSeq)
  }

  test("decontaminate is a broadcast pipeline: no sort-merge join, no cartesian") {
    val p = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus side must stream through broadcast joins:\n$p")
    assert(p.contains("BroadcastHashJoin"))
  }

  // ---- mixtureStats / qualityTiers -----------------------------------

  test("mixture stats: counts, token sums, shares summing to 1") {
    val d = Seq(
      (1L, "a b c", "web"), (2L, "d e", "web"), (3L, "f g h i j", "books")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.mixtureStats(d, "source", "text")
      .as[(String, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("web")._2 == 2 && out("web")._3 == 5)
    assert(out("books")._2 == 1 && out("books")._3 == 5)
    assert(math.abs(out("web")._4 - 0.666667) < 1e-9)  // 2/3 rounded
    assert(out("web")._5 == 0.5 && out("books")._5 == 0.5)
    assert(math.abs(out.values.map(_._4).sum - 1.0) < 1e-5)
  }

  test("quality tiers: monotone in score, all four tiers populated") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = TextAnalysis.qualityTiers(docs, "doc_id", "text")
      .as[(Long, Double, Int)].collect()
    assert(out.map(_._3).toSet == Set(1, 2, 3, 4))
    // sorting by score must never see a tier decrease
    val tiersByScore = out.sortBy(_._2).map(_._3)
    assert(tiersByScore.zip(tiersByScore.tail).forall { case (a, b) => a <= b })
    // quartile cutoffs put ~a quarter in each tier (exact percentiles on
    // a 50-doc fixture allow some slack for tied scores)
    val counts = out.groupBy(_._3).view.mapValues(_.length)
    assert(counts.values.forall(c => c >= out.length / 8))
  }

  // ---- unigramLogProb / clusterStats ---------------------------------

  test("unigram logprob: hand-computed smoothed LM scores") {
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(d, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    // counts a:2 b:2 c:1, total 5, vocab 3 -> p(a)=p(b)=3/8, p(c)=2/8
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L)._2 == r6(math.log(3.0 / 8)))          // all tokens p=3/8
    assert(out(1L)._3 == 3)
    assert(out(2L)._2 == r6((math.log(3.0 / 8) + math.log(2.0 / 8)) / 2))
    assert(out(2L)._3 == 2)
  }

  test("cluster stats: size histogram over a resolved labeling") {
    val resolved = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("node", "label")
    val out = Dedup.clusterStats(resolved)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 1L, 2L -> 1L))
  }

  // ---- weightedSample ------------------------------------------------

  private def mixDocs = spark.range(0, 400)
    .select(col("id").as("doc_id"),
      concat(lit("grp"), (col("id") % 4).cast("string")).as("source"))

  test("weighted sample: per-group rates, absent groups dropped") {
    val rates = Map("grp0" -> 100, "grp1" -> 50, "grp2" -> 0)
    val out = Dedup.weightedSample(mixDocs, "doc_id", "source", rates)
      .select("doc_id", "source").as[(Long, String)].collect()
    val byGroup = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGroup.getOrElse("grp0", 0) == 100) // rate 100 keeps all
    assert(!byGroup.contains("grp2"))           // explicit 0
    assert(!byGroup.contains("grp3"))           // absent from the map
    // rate-50 group: exactly the rows whose bucket is below 50
    val expected = mixDocs.filter(col("source") === "grp1" &&
      Dedup.hashBucket(col("doc_id")) < 50).count()
    assert(byGroup.getOrElse("grp1", 0).toLong == expected && expected > 0)
  }

  test("weighted sample: join face equals the CASE face") {
    val rates = Map("grp0" -> 30, "grp1" -> 70, "grp3" -> 100)
    val caseFace = Dedup.weightedSample(mixDocs, "doc_id", "source", rates)
      .collect().map(_.toSeq).toSet
    val ratesDf = rates.toSeq.toDF("source", "pct")
    val joinFace = Dedup.weightedSampleJoined(mixDocs, "doc_id", "source", ratesDf)
    assert(joinFace.columns.toSeq == mixDocs.columns.toSeq)
    assert(joinFace.collect().map(_.toSeq).toSet == caseFace)
    assert(caseFace.nonEmpty)
  }

  test("weighted sample: duplicate rate rows never duplicate corpus rows") {
    val dupRates = Seq(("grp0", 20), ("grp0", 50)).toDF("source", "pct")
    val out = Dedup.weightedSampleJoined(mixDocs, "doc_id", "source", dupRates)
      .select("doc_id").as[Long].collect()
    assert(out.length == out.distinct.length)
    // max wins deterministically
    val at50 = Dedup.weightedSample(mixDocs, "doc_id", "source",
      Map("grp0" -> 50)).select("doc_id").as[Long].collect().toSet
    assert(out.toSet == at50)
  }

  test("weighted sample: deterministic and monotone in the rate") {
    def ids(pct: Int) = Dedup.weightedSample(mixDocs, "doc_id", "source",
      Map("grp0" -> pct)).select("doc_id").as[Long].collect().toSet
    val at20 = ids(20)
    assert(at20 == ids(20))        // reproducible
    assert(at20.subsetOf(ids(60))) // raising a rate only adds rows
  }

  // ---- fuzzy decontamination ----------------------------------------

  private def fcorpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely different words about spark clusters and shuffle partitions"),
    (3L, "another unrelated document mentioning parquet files and broadcast joins")
  ).toDF("doc_id", "text")
  private def fbench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog near the river bank")
  ).toDF("doc_id", "text")

  test("fuzzy contamination: verbatim copy flagged at jaccard 1, others clean") {
    val out = TextAnalysis.fuzzyContamination(fcorpus, fbench, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 100L, 1.0)))
  }

  test("fuzzy decontaminate: drops near-dups; bench members self-flag") {
    val kept = TextAnalysis.fuzzyDecontaminate(fcorpus, fbench, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    // a benchmark member inside the corpus flags itself at jaccard 1.0
    val self = TextAnalysis.fuzzyContamination(
      fcorpus.unionByName(fbench), fbench, "doc_id", "text")
    assert(self.filter(col("doc_id") === 100L && col("bench_id") === 100L)
      .count() == 1)
  }

  // ---- epoch-aware mixing -------------------------------------------

  test("epoch rates: uncapped past 100, ceiling at 100 * maxEpochs") {
    val d = mixDocs.withColumn("n_chars", col("doc_id") % 7 + 1)
    // budget far above the corpus: every group's target exceeds its mass
    val r = Dedup.temperatureMixEpochRates(d, "source", col("n_chars"),
      alpha = 0.5, budget = 10000000L, maxEpochs = 3)
      .select("source", "pct").as[(String, Int)].collect().toMap
    assert(r.values.forall(_ == 300)) // all pinned to the 3-epoch ceiling
    // a single-epoch ceiling reproduces temperatureMixRates exactly
    val one = Dedup.temperatureMixEpochRates(d, "source", col("n_chars"),
      alpha = 0.5, budget = 700L, maxEpochs = 1).collect().map(_.toSeq).toSet
    val base = Dedup.temperatureMixRates(d, "source", col("n_chars"),
      alpha = 0.5, budget = 700L).collect().map(_.toSeq).toSet
    assert(one == base && base.nonEmpty)
  }

  test("epoch sample: floor(pct/100) full copies + fractional epoch") {
    val rates = Seq(("grp0", 250), ("grp1", 100), ("grp2", 0))
      .toDF("source", "pct")
    val out = Dedup.weightedSampleWithEpochs(mixDocs, "doc_id", "source", rates)
    assert(out.columns.toSeq == mixDocs.columns.toSeq :+ "epoch")
    val copies = out.groupBy("doc_id", "source").count()
      .as[(Long, String, Long)].collect()
    val byGroup = copies.groupBy(_._2)
    // pct=250: every doc at least twice; bucket<50 docs exactly 3 times
    assert(byGroup("grp0").forall(_._3 >= 2))
    val thrice = mixDocs.filter(col("source") === "grp0" &&
      Dedup.hashBucket(col("doc_id")) < 50).select("doc_id")
      .as[Long].collect().toSet
    assert(byGroup("grp0").forall(c => c._3 == (if (thrice(c._1)) 3 else 2)))
    // pct=100: exactly one copy each, epoch 0
    assert(byGroup("grp1").forall(_._3 == 1))
    assert(!byGroup.contains("grp2")) // rate 0 drops the group
    // epoch indices are a dense 0-based prefix per copy set
    val epochs = out.filter(col("source") === "grp0")
      .groupBy("doc_id").agg(sort_array(collect_list(col("epoch"))).as("e"))
      .as[(Long, Seq[Int])].collect()
    assert(epochs.forall(x => x._2 == (0 until x._2.length)))
  }

  test("epoch sample: pct <= 100 reduces to the joined face + epoch 0") {
    val rates = Seq(("grp0", 30), ("grp1", 70)).toDF("source", "pct")
    val flat = Dedup.weightedSampleJoined(mixDocs, "doc_id", "source", rates)
      .collect().map(_.toSeq).toSet
    val ep = Dedup.weightedSampleWithEpochs(mixDocs, "doc_id", "source", rates)
    assert(ep.select("epoch").distinct().as[Int].collect().toSeq == Seq(0))
    assert(ep.drop("epoch").collect().map(_.toSeq).toSet == flat)
    assert(flat.nonEmpty)
  }
}
