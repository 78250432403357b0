package graft.functions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the BPE token-counter semantics that the DuckDB oracle mirrors
  * literally: greedy left-to-right non-overlapping replace, repeated to
  * fixpoint, per merge in rank order (the subword-nmt convention).
  * The doc/word fixtures here were cross-checked against the recursive-
  * CTE formulation in DuckDB before being pinned.
  */
class BpeSpec extends SparkSpec {
  import BpeUtil.{encodeSpec, wordTokensSpec, DefaultMerges}

  test("default-merge encodings match the oracle-verified fixtures") {
    assert(encodeSpec("the", DefaultMerges) === ";the;")
    assert(encodeSpec("theme", DefaultMerges) === ";the;me;")
    assert(encodeSpec("distribution", DefaultMerges) === ";d;is;t;ri;b;u;tion;")
    assert(wordTokensSpec("sequencing", DefaultMerges) === 6)
    assert(wordTokensSpec("and", DefaultMerges) === 1)
    assert(wordTokensSpec("ting", DefaultMerges) === 2)
    assert(wordTokensSpec("aaa", DefaultMerges) === 3) // no (a,a) merge
  }

  test("greedy left-to-right overlap: (a,a) on runs of a") {
    val m = Seq(("a", "a"))
    assert(encodeSpec("aaa", m) === ";aa;a;")   // leftmost pair wins
    assert(encodeSpec("aaaa", m) === ";aa;aa;") // fixpoint catches pair 2
    assert(wordTokensSpec("aaaaa", m) === 3)    // aa aa a
  }

  test("multi-char symbol boundaries are protected") {
    // after (a,b)->ab, (b,c) must not fire against the b INSIDE ab
    val m = Seq(("a", "b"), ("b", "c"))
    assert(encodeSpec("abc", m) === ";ab;c;")
    // but a real b symbol still merges
    assert(encodeSpec("bcabc", m) === ";bc;ab;c;")
  }

  test("later merges consume earlier symbols (ti + on -> tion)") {
    assert(encodeSpec("tion", DefaultMerges) === ";tion;")
  }

  test("BpeTable fast path equals the spec implementation") {
    val flat = DefaultMerges.flatMap { case (x, y) => Seq(x, y) }.toArray
    val table = new BpeTable(flat)
    val words = Seq("the", "theme", "aaa", "and", "ting", "sequencing",
      "distribution", "a", "z9", "xxxxxxxx", "antidisestablishmentarianism",
      "tionontionon", "thethethe", "0123456789")
    words.foreach { w =>
      assert(table.wordTokens(w) === wordTokensSpec(w, DefaultMerges), s"word $w")
      // memoized second call agrees
      assert(table.wordTokens(w) === wordTokensSpec(w, DefaultMerges), s"memo $w")
    }
  }

  test("document counter: word runs + punctuation chars, NULL-in/NULL-out") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, "The theme aaa and, ting!"),     // 1+2+3+1+2 subwords + 2 punct = 11
      (2, "sequencing distribution"),      // 6+7 = 13
      (3, "a\tb\nc  d"),                   // whitespace never counts: 4
      (4, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withBpeTokens(df, "text")
      .select($"doc_id", $"n_bpe_tokens").collect().map(r =>
        r.getInt(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(out(1) === 11)
    assert(out(2) === 13)
    assert(out(3) === 4)
    assert(out(4) === null)
  }

  test("merge table is pluggable at the call site") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "aaaa bb")).toDF("doc_id", "text")
    val out = TextAnalysis.withBpeTokens(df, "text",
        merges = Seq(("a", "a")))
      .select($"n_bpe_tokens").head()
    assert(out === Row(4)) // aaaa -> [aa,aa]=2, bb -> 2
    val outDefault = TextAnalysis.withBpeTokens(df, "text")
      .select($"n_bpe_tokens").head()
    assert(outDefault === Row(6)) // no (a,a)/(b,b) in the default table
  }

  test("uppercase input is lowered by the op before counting") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "THE THEME")).toDF("doc_id", "text")
    val out = TextAnalysis.withBpeTokens(df, "text")
      .select($"n_bpe_tokens").head()
    assert(out === Row(3)) // the=1, theme=2 — not 9 punct chars
  }

  test("mergeArrayPass equals the string-replace fixpoint (incl. x == y runs)") {
    val cases = Seq(
      (Array("a", "a", "a"), "a", "a"),
      (Array("a", "b", "a", "b"), "a", "b"),
      (Array("ab", "c"), "b", "c"),        // boundary: no partial match
      (Array("a", "aa", "a", "aa"), "a", "aa"),
      (Array("x"), "x", "x")) ++
      // x == y runs: replace's resume-after-match skips the symbol after
      // each merge, so runs >= 5 are where plain greedy pairing diverges
      // (run of 5 -> [aa, a, aa], run of 6 -> [aa, a, aa, a], run of 7
      // needs a SECOND pass to reach the fixpoint [aa, a, aa, aa])
      (3 to 12).map(n => (Array.fill(n)("a"), "a", "a")) ++
      // interleaved runs and multi-merge adjacency material
      Seq((Array("b", "a", "a", "a", "a", "a", "b"), "a", "a"),
          (Array("a", "b", "b", "b", "b", "b", "a"), "b", "b"),
          (Array("x", "y", "x", "y", "x", "y", "x"), "x", "y"))
    cases.foreach { case (syms, x, y) =>
      val viaArray = BpeUtil.mergeArrayPass(syms, x, y).toSeq
      // reference: run the string formulation on a synthetic "word" whose
      // chars are the symbols (only valid when symbols are single chars)
      if (syms.forall(_.length == 1) && x.length == 1 && y.length == 1) {
        val enc = BpeUtil.encodeSpec(syms.mkString, Seq((x, y)))
        assert(viaArray === enc.split(";").filter(_.nonEmpty).toSeq,
          s"${syms.toSeq} ($x,$y)")
      }
      // and the invariant: no adjacent (x, y) pair survives
      viaArray.sliding(2).foreach { w =>
        if (w.length == 2) assert(!(w(0) == x && w(1) == y))
      }
    }
    // pinned shapes for the documented divergence cases
    assert(BpeUtil.mergeArrayPass(Array.fill(5)("a"), "a", "a").toSeq ===
      Seq("aa", "a", "aa"))
    assert(BpeUtil.mergeArrayPass(Array.fill(6)("a"), "a", "a").toSeq ===
      Seq("aa", "a", "aa", "a"))
    assert(BpeUtil.mergeArrayPass(Array.fill(7)("a"), "a", "a").toSeq ===
      Seq("aa", "a", "aa", "aa"))
  }

  test("x == y merge with a follow-on consumer: counts agree across paths") {
    // (a,a) then (a,aa): on 'aaaaa' the replace fixpoint is [aa,a,aa] ->
    // [aa,aaa] = 2 tokens; plain greedy pairing would have produced
    // [aa,aa,a] -> 3. Both the array path (training re-encoding) and the
    // string path (counter + oracle) must say 2.
    val m = Seq(("a", "a"), ("a", "aa"))
    assert(wordTokensSpec("aaaaa", m) === 2)
    var syms = Array.fill(5)("a")
    m.foreach { case (x, y) => syms = BpeUtil.mergeArrayPass(syms, x, y) }
    assert(syms.toSeq === Seq("aa", "aaa"))
    // and with the DefaultMerges-style (l,l) + a trained (l,ll) consumer
    val ml = Seq(("l", "l"), ("l", "ll"))
    assert(wordTokensSpec("lllll", ml) === 2)
  }

  test("non-BMP punctuation counts one token per codepoint") {
    val flat = DefaultMerges.flatMap { case (x, y) => Seq(x, y) }.toArray
    val table = new BpeTable(flat)
    def n(s: String) = table.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    // U+1F600 is a surrogate pair in UTF-16: one token, not two
    assert(n("😀") === 1)
    assert(n("a 😀 b") === 3)
    // mixed: word run + BMP punct + two non-BMP codepoints
    assert(n("the!😀😁") === 4) // the=1, !=1, 2 emoji
    // non-BMP between word runs still terminates the run correctly
    assert(n("the😀the") === 3)
  }

  test("trainBpeMerges: deterministic greedy training on a known corpus") {
    val s = spark
    import s.implicits._
    // word freqs: the=3, cat=1 -> pairs (t,h)=3, (h,e)=3, (c,a)=1, (a,t)=1
    // tie at 3 broken by left-symbol order: (h,e) before (t,h)
    val df = Seq((1, "the the cat"), (2, "the")).toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeMerges(df, "text", k = 3)
    assert(merges === Seq(("h", "e"), ("t", "he"), ("a", "t")))
    // trained merges drop into the counter unchanged
    assert(BpeUtil.wordTokensSpec("the", merges) === 1)
    assert(BpeUtil.wordTokensSpec("cat", merges) === 2) // c + at
  }

  test("trainBpeMerges: terminates early when nothing is left to merge") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "a b c")).toDF("doc_id", "text")
    // single-char words have no adjacent pairs at all
    assert(TextAnalysis.trainBpeMerges(df, "text", k = 5) === Seq.empty)
  }

  test("ws-mode consumers are untouched by the added column (pluggability)") {
    val s = spark
    val docs = graft.Tables.documents(s, SparkSpec.sf0001)
    val base = graft.ops.Dedup.tokenBudgetSample(docs, "doc_id", "n_chars", 75000L)
    val viaBpeDf = graft.ops.Dedup.tokenBudgetSample(
      TextAnalysis.withBpeTokens(docs, "text"), "doc_id", "n_chars", 75000L)
    assert(base.collect().toSet === viaBpeDf.collect().toSet)
  }
}
