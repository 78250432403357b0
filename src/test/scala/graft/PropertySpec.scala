package graft

import graft.ops.{Aggregations, Cleaning, Dedup, Quality}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck invariants (SURVEY §5): properties the operators must hold
  * for ANY input, not just the fixtures. Spark-backed properties run a
  * reduced number of samples (each sample is a Spark job).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, samples: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples), prop)
    assert(res.passed, res.status.toString)
  }

  private val rawString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.oneOf("", "   ", "http://x.com", "https://y.org", "www.z.net",
      "  spaced.com  ", "HTTPS://UPPER.COM"))

  test("P4 URL normalization is idempotent (pure column function)") {
    val norm = Cleaning.normalizeUrlCol(col("u"))
    // evaluate via a single DataFrame holding many generated samples
    val gen = Gen.listOfN(200, rawString)
    check(Prop.forAll(gen) { us =>
      val df = us.toDF("u")
      val first = df.select(norm.as("u")).as[Option[String]].collect()
      val twice = df.select(norm.as("u")).toDF("u")
        .select(norm.as("u")).as[Option[String]].collect()
      first.sameElements(twice)
    }, samples = 5)
  }

  test("F1 split conserves rows and partitions them exactly") {
    val row = for {
      id <- Gen.option(Gen.alphaNumStr)
      ty <- Gen.option(Gen.alphaNumStr)
    } yield (id, ty)
    check(Prop.forAll(Gen.listOfN(100, row)) { rows =>
      val df = rows.toDF("id", "brewery_type")
      val (valid, quar) = Quality.nullKeySplit(df, Seq("id", "brewery_type"))
      val expectBad = rows.count(r => r._1.isEmpty || r._2.isEmpty)
      valid.count() + quar.count() == rows.length &&
        quar.count() == expectBad
    }, samples = 5)
  }

  test("A2 rolls up to A3: summing over brewery_type preserves counts") {
    val row = for {
      ty <- Gen.oneOf("micro", "nano", "bar")
      loc <- Gen.oneOf("US", "DE")
      st <- Gen.oneOf("CA", "TX", "BY")
      city <- Gen.oneOf("a", "b", "c")
    } yield (ty, loc, st, city)
    check(Prop.forAll(Gen.listOfN(300, row)) { rows =>
      val silver = rows.toDF("brewery_type", "location", "state", "city")
      val a2 = Aggregations.goldByTypeLocation(silver)
      val a3 = Aggregations.goldByLocation(silver)
      val rolled = a2.groupBy("location", "state", "city")
        .agg(sum("brewery_count").as("brewery_count"))
        .as[(String, String, String, Long)].collect().toSet
      val direct = a3.as[(String, String, String, Long)].collect().toSet
      rolled == direct
    }, samples = 5)
  }

  test("exact dedup conserves cardinality: sum(n_copies) == row count") {
    val gen = Gen.listOfN(120,
      Gen.oneOf("aaa bbb ccc", "xxx yyy zzz", "one two three", "unique"))
    check(Prop.forAll(gen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.exact(df, "doc_id", "text")
      out.agg(sum("n_copies")).as[Long].head() == texts.length
    }, samples = 5)
  }

  test("minhash signatures are permutation-invariant over document order") {
    val docGen = Gen.listOfN(8, Gen.oneOf("w1", "w2", "w3", "w4"))
      .map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(20, docGen)) { texts =>
      val df1 = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val df2 = texts.zipWithIndex.reverse.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val s1 = Dedup.minhashSketch(df1, "doc_id", "text", 3, 8)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val s2 = Dedup.minhashSketch(df2, "doc_id", "text", 3, 8)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      s1 == s2
    }, samples = 3)
  }

  // reference model for the ws tokenizer: Java regex split, empties dropped
  private def refWsGrams(s: String, k: Int, distinct: Boolean): Seq[String] = {
    val toks = s.split("\\s+", -1).filter(_.nonEmpty).toSeq
    val grams =
      if (toks.length < k) Seq.empty
      else toks.sliding(k).map(_.mkString(" ")).toSeq
    if (distinct) grams.distinct else grams
  }

  private val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
  private val wsText: Gen[String] = Gen.listOf(Gen.frequency(
    4 -> Gen.alphaNumChar, 2 -> Gen.oneOf(wsChars),
    1 -> Gen.oneOf('ü', 'ß', '.', '-'))).map(_.mkString)

  test("ws-mode WordGrams equals the regex-split reference model (pure fn)") {
    // direct expression-runtime check, no Spark job per sample
    import org.apache.spark.unsafe.types.UTF8String
    check(Prop.forAll(wsText, Gen.choose(1, 4), Gen.oneOf(true, false)) {
      (s, k, distinct) =>
        val got = graft.functions.WordGramsUtil
          .grams(UTF8String.fromString(s), k, distinct, ws = true)
          .toArray[UTF8String](org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
        got == refWsGrams(s, k, distinct)
    }, samples = 300)
  }

  test("ws-mode StopwordHits equals the regex-split reference model (pure fn)") {
    import org.apache.spark.unsafe.types.UTF8String
    val words = new java.util.HashSet[String]()
    Seq("the", "a", "of", "and", "to").foreach(words.add)
    check(Prop.forAll(wsText) { s =>
      val got = graft.functions.TextScoreUtil
        .hitCount(UTF8String.fromString(s), words, ws = true)
      val want = s.split("\\s+", -1).count(t => t.nonEmpty && words.contains(t))
      got == want
    }, samples = 300)
  }

  test("token-budget sample is a monotone prefix: growing budgets nest") {
    // one corpus, several budgets: each larger budget's kept set must be
    // a superset, and every kept set is a PREFIX of the same global order
    val corpus = (1L to 300L).map(i => (i, (i * 53 % 97 + 5).toInt))
    val df = corpus.toDF("doc_id", "n_chars")
    val budgets = Seq(0L, 500L, 3000L, 9000L, 1L << 30)
    val kept = budgets.map { b =>
      b -> Dedup.tokenBudgetSample(df, "doc_id", "n_chars", b)
        .as[(Long, Int, Long)].collect().map(_._1).toSet
    }
    kept.sliding(2).foreach { case Seq((b1, s1), (b2, s2)) =>
      assert(s1.subsetOf(s2), s"budget $b1 set must nest in $b2") }
    assert(kept.head._2.isEmpty && kept.last._2.size == 300)
    // budget respected: preceding mass of every kept doc is under budget
    budgets.filter(b => b > 0 && b < (1L << 30)).foreach { b =>
      val rows = Dedup.tokenBudgetSample(df, "doc_id", "n_chars", b)
        .as[(Long, Int, Long)].collect()
      rows.foreach { case (_, _, cum) => assert(cum < b) }
    }
  }

  test("rrfFuse ranks by fused score with deterministic id tie-breaks") {
    val listGen = Gen.listOfN(20, Gen.choose(1L, 40L)).map(_.distinct)
    import org.scalacheck.Prop.propBoolean
    check(Prop.forAll(listGen, listGen) { (a, b) =>
      (a.nonEmpty && b.nonEmpty) ==> {
        val la = a.zipWithIndex.map { case (d, i) => (d, i + 1) }
          .toDF("doc_id", "rnk")
        val lb = b.zipWithIndex.map { case (d, i) => (d, i + 1) }
          .toDF("doc_id", "rnk")
        val out = graft.ops.TextAnalysis
          .rrfFuse(Seq(la, lb), "doc_id", "rnk", kRrf = 60, topK = 100)
          .as[(Long, Double, Int, Int)].collect().sortBy(_._4)
        // scalar reference
        val want = (a.zipWithIndex.map { case (d, i) => d -> (i + 1) } ++
          b.zipWithIndex.map { case (d, i) => d -> (i + 1) })
          .groupBy(_._1).view
          .mapValues(rs => math.rint(rs.map(r => 1.0 / (60 + r._2)).sum * 1e6) / 1e6)
          .toSeq.sortBy { case (d, s) => (-s, d) }
        out.map(r => (r._1, r._2)).toSeq == want
      }
    }, samples = 8)
  }

  test("substring dedup equals the brute-force reference and is idempotent") {
    // docs over a TINY vocabulary so w-window collisions actually occur;
    // w=3 keeps the reference cheap. Reference: doc d drops iff some
    // lower-id doc shares at least one 3-token window.
    val word = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val corpusGen = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, docGen))
    def windows(text: String): Set[Seq[String]] = {
      val t = text.split(" ").toSeq
      if (t.length < 3) Set.empty else t.sliding(3).map(_.toSeq).toSet
    }
    check(Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val kept = graft.ops.TextAnalysis
        .substringDedup(df, "doc_id", "text", w = 3)
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      val want = docs.filter { case (id, t) =>
        !docs.exists { case (id2, t2) =>
          id2 < id && windows(t).intersect(windows(t2)).nonEmpty }
      }
      // reference equivalence; the kept set is therefore pairwise
      // window-disjoint, which makes a second pass the identity
      kept == want && {
        val again = graft.ops.TextAnalysis
          .substringDedup(kept.toDF("doc_id", "text"), "doc_id", "text", w = 3)
          .as[(Long, String)].collect().sortBy(_._1).toSeq
        again == kept
      }
    }, samples = 8)
  }
}
