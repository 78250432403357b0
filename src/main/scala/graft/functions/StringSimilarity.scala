package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen'd expression — the
  * standard record-linkage re-ranker (Winkler 1990), scored over
  * candidate pairs AFTER blocking (PassJoin segments, LSH buckets);
  * it has no exact pigeonhole decomposition of its own, so its
  * production role is the second stage, never the pair generator.
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` so the
  * oracle can gate bit-for-bit (verified empirically on 3000 random
  * pairs — EXACT double equality, same op order):
  *  - operates on UTF-8 BYTES, not code points (DuckDB inherits this
  *    from its byte-oriented implementation; multi-byte characters
  *    count once per byte);
  *  - either side empty → 0.0, INCLUDING both empty (before the
  *    equality shortcut);
  *  - Jaro = (m/|a| + m/|b| + (m−t)/m) / 3 with the classic
  *    half-window match rule and transpositions halved;
  *  - the Winkler prefix boost (scale 0.1, prefix capped at 4 bytes)
  *    applies only when Jaro EXCEEDS 0.7.
  */
object JaroWinklerImpl {
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return boost(s1, s2, 1.0)
    val matchDist = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(l2, i + matchDist + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (matches.toDouble / l1 + matches.toDouble / l2 +
      (matches - t).toDouble / matches) / 3.0
    boost(s1, s2, jaro)
  }

  private def boost(s1: Array[Byte], s2: Array[Byte], jaro: Double): Double = {
    if (jaro <= 0.7) return jaro
    val cap = math.min(4, math.min(s1.length, s2.length))
    var l = 0
    while (l < cap && s1(l) == s2(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  // a static call keeps the expression inside whole-stage codegen (no
  // interpreted fallback); the loop itself lives in compiled Scala
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
