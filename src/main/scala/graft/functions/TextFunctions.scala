package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[WordGrams]]: word k-grams of a space-separated string as
  * one compiled scan, no per-element lambda dispatch.
  *
  * Token semantics match `split(text, " ")` with limit -1 (single-space
  * separator, empty tokens from consecutive/leading/trailing spaces kept),
  * and each gram equals `array_join(slice(tokens, i, k), " ")`. Because
  * the separator is a single space, a gram is exactly the substring of the
  * input between the first char of token i and the last char of token
  * i+k-1 — so grams are emitted as substrings of the original buffer, no
  * per-gram join.
  */
object WordGramsUtil {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def grams(s: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val str = s.toString
    val len = str.length
    var nSpaces = 0
    var i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') nSpaces += 1
      i += 1
    }
    val nTok = nSpaces + 1
    val nGrams = nTok - k + 1
    if (nGrams <= 0) return Empty
    // token boundaries as char offsets: starts(j) inclusive, ends(j) exclusive
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = len
    if (!distinct) {
      val out = new Array[Any](nGrams)
      var g = 0
      while (g < nGrams) {
        out(g) = UTF8String.fromString(str.substring(starts(g), ends(g + k - 1)))
        g += 1
      }
      new GenericArrayData(out)
    } else {
      // first-occurrence order, same as array_distinct
      val seen = new java.util.LinkedHashSet[String](nGrams * 2)
      var g = 0
      while (g < nGrams) {
        seen.add(str.substring(starts(g), ends(g + k - 1)))
        g += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Native Catalyst expression for the text-dedup hot path: word k-grams
  * (optionally per-document distinct) of a string column.
  *
  * Why a custom Expression instead of
  * `array_distinct(transform(sequence(...), i -> array_join(slice(ws, i, k))))`:
  * Spark's higher-order functions evaluate INTERPRETED — per-gram lambda
  * dispatch, boxing, and an allocated intermediate token array per gram —
  * and `InferFiltersFromGenerate` re-evaluates the whole array expression
  * in the filter it pushes under the explode, doubling that cost. This
  * expression participates in whole-stage codegen as a single static call
  * into [[WordGramsUtil]] (measured ~8x on the shingle stage of the fuzzy
  * dedup pipeline at sf0.1).
  *
  * Oracle parity: grams equal DuckDB's
  * `array_to_string(string_split(text, ' ')[i:i+k-1], ' ')` — see
  * [[graft.queries.LlmQueries]].
  */
case class WordGrams(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_grams expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_grams"

  override protected def nullSafeEval(input: Any): Any =
    WordGramsUtil.grams(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramsUtil.grams($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}
