package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair-encoding token accounting.
  *
  * Training-data budgets ("sample exactly N tokens", "pack 4096-token
  * sequences", "per-domain token shares") are stated in SUBWORD tokens,
  * not whitespace words or characters. This module provides a
  * deterministic, engine-reproducible subword token counter:
  *
  *   - tokens of a document = Σ over its `[a-z0-9]+` word runs of the
  *     word's BPE symbol count, plus 1 per non-word non-whitespace
  *     character (punctuation tokenizes to single symbols);
  *   - a word's symbols come from applying a FIXED, ordered merge table
  *     with greedy left-to-right, non-overlapping, repeat-until-fixpoint
  *     semantics (the subword-nmt convention).
  *
  * The merge semantics are defined so they can be reproduced EXACTLY in
  * ANSI-ish SQL: encode a word as `;c1;c2;...;cn;`, and apply merge
  * (x, y) as the literal string replacement `;x;y;` -> `;xy;` repeated
  * until the string stops changing. Both Java's `String.replace` and
  * DuckDB's `replace()` scan left to right over non-overlapping literal
  * occurrences, so one pass here IS one pass there — the oracle mirrors
  * tokenization with a recursive CTE over the same table
  * ([[BpeUtil.mergesValuesSql]]).
  *
  * [[BpeUtil.DefaultMerges]] is a stand-in vocabulary: frequency-ordered
  * English character bigrams plus a few second-level merges (public
  * knowledge; the shape of any published BPE merges file). Production
  * swaps in a real released merges table — the expression takes the
  * table as a parameter, and every consumer below it
  * (`tokenBudgetSample`, `packSequences`, `mixtureStatsWith`) takes the
  * token counter as a pluggable COLUMN, so the accounting basis is a
  * one-line change at the call site.
  *
  * Scale posture: the counter is a map-only codegen expression — no
  * shuffle, no vocab relation, no UDF serialization; the per-task
  * distinct-word cache ([[BpeTable]]) makes the amortized cost per word
  * instance a hash lookup, which is what lets a 100 TB corpus re-count
  * tokens in the same pass that reads the text.
  */
object BpeUtil {

  /** Frequency-ordered English character bigrams (ranks 1-38) plus
    * second-level merges (39-48). Fixed and public; NOT a claim of
    * optimality — a deterministic stand-in with the structure of a real
    * merges file (later merges may consume symbols built by earlier
    * ones, e.g. `ti`+`on`).
    */
  val DefaultMerges: IndexedSeq[(String, String)] = IndexedSeq(
    ("t", "h"), ("h", "e"), ("i", "n"), ("o", "n"), ("e", "r"),
    ("a", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("t", "i"), ("e", "s"), ("o", "r"), ("t", "e"), ("o", "f"),
    ("e", "d"), ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"),
    ("s", "t"), ("t", "o"), ("n", "t"), ("n", "g"), ("s", "e"),
    ("h", "a"), ("a", "s"), ("o", "u"), ("i", "o"), ("l", "e"),
    ("v", "e"), ("c", "o"), ("m", "e"), ("d", "e"), ("h", "i"),
    ("r", "i"), ("r", "o"), ("i", "c"),
    ("th", "e"), ("in", "g"), ("an", "d"), ("ti", "on"), ("er", "s"),
    ("c", "h"), ("l", "l"), ("o", "o"), ("s", "s"), ("e", "e"))

  /** The oracle's merge table as a SQL VALUES list `(rank, pat, rep)` —
    * generated from the SAME Scala table the expression compiles in, so
    * the two engines cannot drift.
    */
  def mergesValuesSql(merges: Seq[(String, String)] = DefaultMerges): String =
    merges.zipWithIndex.map { case ((x, y), i) =>
      s"(${i + 1}, ';$x;$y;', ';$x$y;')"
    }.mkString(", ")

  /** Spec implementation of word tokenization (the string-replace
    * formulation the oracle mirrors literally). [[BpeTable]] runs the
    * same algorithm on primitive arrays; [[graft.BpeSpec]] pins their
    * equality.
    */
  def encodeSpec(word: String, merges: Seq[(String, String)]): String = {
    var enc = ";" + word.map(c => s"$c;").mkString
    merges.foreach { case (x, y) =>
      val pat = s";$x;$y;"
      val rep = s";$x$y;"
      var prev: String = null
      while (enc ne prev) {
        prev = enc
        enc = enc.replace(pat, rep)
      }
    }
    enc
  }

  /** Symbol count of one word under `merges` (spec path). */
  def wordTokensSpec(word: String, merges: Seq[(String, String)]): Int = {
    val enc = encodeSpec(word, merges)
    var n = 0
    var i = 0
    while (i < enc.length) {
      if (enc.charAt(i) == ';') n += 1
      i += 1
    }
    n - 1
  }

  /** Apply one merge to a symbol array — the EXACT fixpoint of the
    * string-replace formulation ([[encodeSpec]] / the DuckDB oracle).
    *
    * `String.replace` scans left to right over NON-OVERLAPPING literal
    * occurrences of `;x;y;`: a match consumes the `;` after `y`, which is
    * also the leading `;` of the NEXT symbol — so within one replace pass
    * the symbol immediately after a merge can never START a match. For
    * x != y that quirk is invisible (adjacent (x, y) pairs cannot overlap,
    * and merging never creates new ones, so the fixpoint merges them all
    * regardless of scan order). For x == y it is load-bearing: on a run
    * `aaaaa` the replace fixpoint yields `[aa, a, aa]`, NOT the plain
    * greedy `[aa, aa, a]` — and a follow-on merge like (a, aa) then
    * produces different token counts for the two shapes. We therefore
    * mirror replace exactly: single passes with the resume-after-match
    * skip, repeated until nothing changes (matching the per-merge
    * `while (changed)` loop in [[encodeSpec]] and [[BpeTable.wordTokens]]).
    * [[graft.functions.BpeSpec]] pins the equality against [[encodeSpec]],
    * including odd x == y runs >= 5.
    */
  def mergeArrayPass(syms: Array[String], x: String, y: String): Array[String] = {
    var cur = syms
    var changed = true
    while (changed) {
      changed = false
      val out = new java.util.ArrayList[String](cur.length)
      var i = 0
      while (i < cur.length) {
        if (i + 1 < cur.length && cur(i) == x && cur(i + 1) == y) {
          out.add(x + y); i += 2; changed = true
          // the trailing ';' of the match was consumed, so the next
          // symbol cannot start a match in THIS pass: copy it verbatim
          if (i < cur.length) { out.add(cur(i)); i += 1 }
        } else { out.add(cur(i)); i += 1 }
      }
      cur = out.toArray(new Array[String](out.size))
    }
    cur
  }

  @inline private[functions] def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Java-regex `\s` membership (same set as [[WordGramsUtil]]). */
  @inline private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

/** Compiled merge table + per-table distinct-word memo. One instance per
  * expression (= per merges configuration), shipped to executors as a
  * codegen reference object; the cache is corpus-vocabulary-sized and
  * capped, so a pathological corpus of unique random words degrades to
  * recomputation, never to memory growth.
  */
final class BpeTable(merges: Array[String]) extends Serializable {
  // merges flattened as [x0, y0, x1, y1, ...] for a serializable shape
  @transient private lazy val pats: Array[String] =
    Array.tabulate(merges.length / 2)(i => ";" + merges(2 * i) + ";" + merges(2 * i + 1) + ";")
  @transient private lazy val reps: Array[String] =
    Array.tabulate(merges.length / 2)(i => ";" + merges(2 * i) + merges(2 * i + 1) + ";")

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer](1 << 12)
  private val CacheCap = 1 << 16

  def pairs: Seq[(String, String)] =
    (0 until merges.length / 2).map(i => (merges(2 * i), merges(2 * i + 1)))

  /** Symbol count for one word: memoized string-replace fixpoint. */
  def wordTokens(word: String): Int = {
    val hit = cache.get(word)
    if (hit != null) return hit.intValue()
    var enc = {
      val sb = new java.lang.StringBuilder(word.length * 2 + 1)
      sb.append(';')
      var i = 0
      while (i < word.length) { sb.append(word.charAt(i)).append(';'); i += 1 }
      sb.toString
    }
    var m = 0
    while (m < pats.length) {
      var prev: String = null
      while (enc ne prev) {
        prev = enc
        enc = enc.replace(pats(m), reps(m))
      }
      m += 1
    }
    var n = -1
    var i = 0
    while (i < enc.length) {
      if (enc.charAt(i) == ';') n += 1
      i += 1
    }
    if (cache.size < CacheCap) cache.put(word, Integer.valueOf(n))
    n
  }

  /** Document token count: word-run symbols + 1 per other non-ws
    * CODEPOINT. Non-word characters are counted per Unicode codepoint
    * (a surrogate pair is ONE token), matching DuckDB's per-codepoint
    * counting — real crawl text routinely carries non-BMP characters
    * (emoji, rare CJK), and budgets must not drift off the oracle there.
    * Word runs and whitespace are `[a-z0-9]` / `\s` — BMP by definition,
    * so only the punctuation branch needs the surrogate step.
    */
  def countTokens(text: UTF8String): Int = {
    val s = text.toString
    var total = 0
    var i = 0
    var runStart = -1
    while (i <= s.length) {
      val wordChar = i < s.length && BpeUtil.isWordChar(s.charAt(i))
      if (wordChar && runStart < 0) runStart = i
      if (!wordChar && runStart >= 0) {
        total += wordTokens(s.substring(runStart, i))
        runStart = -1
      }
      if (!wordChar && i < s.length) {
        val c = s.charAt(i)
        if (!BpeUtil.isWs(c)) total += 1
        // a surrogate pair is one codepoint: skip its low half
        if (Character.isHighSurrogate(c) && i + 1 < s.length &&
            Character.isLowSurrogate(s.charAt(i + 1))) i += 1
      }
      i += 1
    }
    total
  }
}

/** Native codegen single-merge application over a symbol array:
  * `graft_bpe_merge(syms, x, y)` — the per-round re-encoding step of
  * distributed BPE TRAINING ([[graft.ops.TextAnalysis.trainBpeMerges]]).
  * NULL-in/NULL-out; the string-replace fixpoint (see
  * [[BpeUtil.mergeArrayPass]]), so trained merge tables imply exactly
  * the encodings the counter and the oracle produce.
  */
case class BpeMergeApply(child: Expression, x: String, y: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(_: StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_merge expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_merge"

  override protected def nullSafeEval(input: Any): Any =
    BpeMergeApply.applyData(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], x, y)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xRef = ctx.addReferenceObj("bpeMergeX", x, "java.lang.String")
    val yRef = ctx.addReferenceObj("bpeMergeY", y, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeMergeApply.applyData($c, $xRef, $yRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeApply =
    copy(child = newChild)
}

object BpeMergeApply {
  /** Codegen entry point: ArrayData in, ArrayData out. */
  def applyData(input: org.apache.spark.sql.catalyst.util.ArrayData,
                x: String, y: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val arr = input.toArray[UTF8String](StringType).map(_.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      BpeUtil.mergeArrayPass(arr, x, y)
        .map(s => UTF8String.fromString(s).asInstanceOf[Any]))
  }
}

/** Native codegen subword token counter: `graft_bpe_tokens(text)` (or
  * with an explicit flattened merges array literal). NULL-in/NULL-out.
  */
case class BpeTokenCount(child: Expression,
                         merges: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType =>
      if (merges.nonEmpty && merges.length % 2 == 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "graft_bpe_tokens merges must be a non-empty flattened pair list")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_tokens expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_bpe_tokens"

  @transient private lazy val table = new BpeTable(merges.toArray)

  override protected def nullSafeEval(input: Any): Any =
    table.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$tableRef.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
