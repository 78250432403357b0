package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[WordGrams]] must be a drop-in replacement for the HOF formulation it
  * displaced: `transform(sequence(1, size(ws)-k+1), i -> array_join(
  * slice(ws, i, k), ' '))` over `ws = split(lower(text), ' ')`, with
  * `array_distinct` on top for the distinct variant. Equality is checked
  * on the real documents fixture (planted dups, multi-space edge cases get
  * explicit rows).
  */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofGrams(textCol: String, k: Int, distinct: Boolean) = {
    val ws = split(lower(col(textCol)), " ")
    val raw = when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => array_join(slice(ws, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    if (distinct) array_distinct(raw) else raw
  }

  private def native(textCol: String, k: Int, distinct: Boolean) = {
    GraftFunctions.register(spark)
    call_function("graft_word_grams", lower(col(textCol)), lit(k), lit(distinct))
  }

  private val edge = Seq(
    "", " ", "  ", "one", "one two", "one two three",
    "a  double  space run", " leading space", "trailing space ",
    "rep rep rep rep rep", "Tabs\tstay intact here today",
    "ümlaut ünïcode grams über alles").toDF("text")

  for (k <- Seq(2, 3, 5); distinct <- Seq(true, false)) {
    test(s"word grams k=$k distinct=$distinct match the HOF formulation (edge cases)") {
      val diff = edge.select(
        hofGrams("text", k, distinct).as("hof"),
        native("text", k, distinct).as("ng"))
        .filter(not(col("hof") === col("ng")))
      assert(diff.count() == 0, diff.collect().mkString("\n"))
    }
  }

  test("word grams match the HOF formulation on the documents fixture (k=3)") {
    val docs = Tables.documents(spark, SparkSpec.sf0001)
    val diff = docs.select(
      hofGrams("text", 3, true).as("hof"),
      native("text", 3, true).as("ng"))
      .filter(not(col("hof") === col("ng")))
    assert(diff.count() == 0)
  }

  test("null text yields null grams") {
    val one = Seq(Tuple1[String](null)).toDF("text")
    assert(one.select(native("text", 3, false)).collect().head.isNullAt(0))
  }

  // ---- whitespace-robust (ws) mode: split('\s+') semantics -------------

  private def hofWsGrams(textCol: String, k: Int, distinct: Boolean) = {
    val ws = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val raw = when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => array_join(slice(ws, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    if (distinct) array_distinct(raw) else raw
  }

  private def nativeWs(textCol: String, k: Int, distinct: Boolean) = {
    GraftFunctions.register(spark)
    call_function("graft_word_grams", lower(col(textCol)), lit(k),
      lit(distinct), lit(true))
  }

  private val wsEdge = Seq(
    "", " \t ", "\n", "one", "one\ttwo\nthree",
    "  leading and\ttrailing  ", "multi   space\t\truns here today",
    "line\nbreaks\r\nand tabs\tmix freely", "rep rep\trep\nrep rep",
    "ümlaut\tünïcode\ngrams über alles").toDF("text")

  for (k <- Seq(1, 2, 3); distinct <- Seq(true, false)) {
    test(s"ws-mode grams k=$k distinct=$distinct match split('\\\\s+') semantics") {
      val diff = wsEdge.union(edge).select(
        hofWsGrams("text", k, distinct).as("hof"),
        nativeWs("text", k, distinct).as("ng"))
        .filter(not(col("hof") === col("ng")))
      assert(diff.count() == 0, diff.collect().mkString("\n"))
    }
  }

  test("ws-mode grams match the simple mode on single-space fixture text") {
    val docs = Tables.documents(spark, SparkSpec.sf0001)
    val diff = docs.select(
      native("text", 3, true).as("simple"),
      nativeWs("text", 3, true).as("ws"))
      .filter(not(col("simple") === col("ws")))
    assert(diff.count() == 0)
  }

  test("ws-mode stopword hits match the regex-split formulation") {
    GraftFunctions.register(spark)
    import graft.ops.TextAnalysis
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .select("text").union(wsEdge).union(edge)
    val list = TextAnalysis.Stopwords("en")
    val hof = size(filter(split(lower(col("text")), "\\s+"),
      w => w =!= "" && array_contains(array(list.map(lit): _*), w)))
    val ng = call_function("graft_stopword_hits",
      lower(col("text")), lit(list.toArray), lit(true))
    val diff = docs.select(hof.as("a"), ng.as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0, diff.collect().take(5).mkString("\n"))
  }

  test("stopword hits match the HOF formulation on fixture + edge cases") {
    GraftFunctions.register(spark)
    import graft.ops.TextAnalysis
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .select("text").union(edge)
    for (lang <- TextAnalysis.LangPriority) {
      val list = TextAnalysis.Stopwords(lang)
      val hof = size(filter(split(lower(col("text")), " "),
        w => array_contains(array(list.map(lit): _*), w)))
      val ng = call_function("graft_stopword_hits",
        lower(col("text")), lit(list.toArray))
      val diff = docs.select(hof.as("a"), ng.as("b"))
        .filter(col("a") =!= col("b"))
      assert(diff.count() == 0, s"lang=$lang")
    }
  }

  test("char-gram fingerprint matches the HOF formulation on the fixture") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .select("text").union(edge.filter(length(col("text")) > 0))
    val gramsExpr = expr(
      "transform(sequence(1, greatest(length(text) - 7, 1)), " +
        "i -> substring(text, i, 8))")
    val fp = call_function("graft_char_fingerprint", col("text"), lit(8))
    val diff = docs.select(
      array_min(transform(gramsExpr, g => md5(g))).as("h1"),
      size(array_distinct(gramsExpr)).as("d1"),
      fp.getField("fp_min_hash").as("h2"),
      fp.getField("n_distinct_grams").as("d2"))
      .filter(col("h1") =!= col("h2") || col("d1") =!= col("d2"))
    assert(diff.count() == 0, diff.collect().take(5).mkString("\n"))
  }
}

/** [[WeightedMinOverlap]] must equal the HOF/exploded formulation of
  * Σ_w min(tf_a, tf_b) it displaced in the weighted join family's
  * verify, on arrays sorted the way the operators build them
  * (sort_array on struct(w, tf) — UTF8String binary order on w).
  */
class WeightedMinOverlapSpec extends graft.SparkSpec {
  import spark.implicits._

  private def viaExpr(rows: Seq[(Seq[(String, Long)], Seq[(String, Long)])]) = {
    GraftFunctions.register(spark)
    rows.toDF("a", "b")
      .select(
        call_function("graft_woverlap",
          expr("transform(sort_array(transform(a, x -> struct(x._1 as w, x._2 as tf))), x -> x.w)"),
          expr("transform(sort_array(transform(a, x -> struct(x._1 as w, x._2 as tf))), x -> x.tf)"),
          expr("transform(sort_array(transform(b, x -> struct(x._1 as w, x._2 as tf))), x -> x.w)"),
          expr("transform(sort_array(transform(b, x -> struct(x._1 as w, x._2 as tf))), x -> x.tf)"))
          .as("m"))
      .collect().map(_.getLong(0)).toSeq
  }

  private def brute(a: Seq[(String, Long)], b: Seq[(String, Long)]): Long = {
    val mb = b.toMap
    a.map { case (w, t) => math.min(t, mb.getOrElse(w, 0L)) }.sum
  }

  test("sorted-merge overlap equals the brute-force sum of mins") {
    val cases = Seq(
      // identical multisets
      (Seq("x" -> 3L, "y" -> 1L), Seq("x" -> 3L, "y" -> 1L)),
      // partial overlap, differing tf on the shared token
      (Seq("a" -> 5L, "b" -> 2L, "c" -> 1L), Seq("b" -> 7L, "c" -> 1L, "d" -> 4L)),
      // disjoint
      (Seq("a" -> 1L), Seq("z" -> 9L)),
      // empty sides
      (Seq.empty[(String, Long)], Seq("a" -> 1L)),
      (Seq.empty[(String, Long)], Seq.empty[(String, Long)]),
      // interleaved keys exercising both advance branches
      (Seq("a" -> 1L, "c" -> 2L, "e" -> 3L, "g" -> 4L),
       Seq("b" -> 1L, "c" -> 9L, "f" -> 1L, "g" -> 2L)),
      // multi-byte tokens (UTF8String binary order)
      (Seq("αβ" -> 2L, "日本" -> 5L), Seq("αβ" -> 3L, "zz" -> 1L)))
    val got = viaExpr(cases)
    val want = cases.map { case (a, b) => brute(a, b) }
    assert(got == want, s"got $got want $want")
  }

  test("codegen and interpreted eval agree") {
    GraftFunctions.register(spark)
    val df = Seq((Seq("a", "b", "c"), Seq(2L, 3L, 1L),
        Seq("b", "c", "d"), Seq(5L, 1L, 7L)))
      .toDF("wa", "ta", "wb", "tb")
    val c = call_function("graft_woverlap",
      col("wa"), col("ta"), col("wb"), col("tb"))
    // codegen path (projection) and interpreted path (filter eval on the
    // same expression via a constant-folding-proof wrapper) must agree
    val viaProject = df.select(c.as("m")).collect().head.getLong(0)
    assert(viaProject == math.min(3L, 5L) + math.min(1L, 1L))
    val viaFilter = df.filter(c === lit(4L)).count()
    assert(viaFilter == 1L)
  }
}
