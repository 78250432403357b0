package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** graft_jaro_winkler — pinned to DuckDB's byte-oriented
  * jaro_winkler_similarity so the oracle can hash-gate raw scores.
  */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("classic textbook values") {
    // jaro(martha, marhta) = 0.944..., prefix 3 -> 0.961111...
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(jw("same", "same") == 1.0)
  }

  test("empty-side rule and the 0.7 boost threshold (the DuckDB pins)") {
    // DuckDB returns 0 whenever either side is empty — INCLUDING both
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0 && jw("abc", "") == 0.0)
    // jaro(fc, fd) = 2/3 <= 0.7: NO prefix boost despite the shared 'f'
    assert(math.abs(jw("fc", "fd") - 2.0 / 3.0) < 1e-15)
    // completely disjoint -> 0
    assert(jw("abc", "xyz") == 0.0)
  }

  test("byte semantics: multi-byte characters count per byte") {
    // DuckDB's implementation walks UTF-8 bytes; 'é' is 2 bytes, so
    // the similarity differs from the code-point interpretation
    // (values taken from DuckDB itself)
    assert(math.abs(jw("héllo", "hello") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("日本語", "日本誤") - 0.9555555555555556) < 1e-15)
  }

  test("runs inside whole-stage codegen as a Column function") {
    GraftFunctions.register(spark)
    val nulls = Seq(("x", null: String)).toDF("a", "b")
      .select(call_function("graft_jaro_winkler", col("a"), col("b")))
      .collect()
    assert(nulls.head.isNullAt(0)) // null-intolerant binary expression
    // a non-foldable source, so the projection must actually compile:
    // eval parity between the codegen'd column and the direct call
    val df = spark.range(200)
      .select(concat(lit("nm"), (col("id") * 17 % 97)).as("a"),
        concat(lit("nm"), (col("id") * 13 % 89)).as("b"))
      .withColumn("jw", call_function("graft_jaro_winkler",
        col("a"), col("b")))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; the jw projection must carry it (no interpreted fallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_jaro_winkler") && l.trim.startsWith("*(")), plan)
    df.collect().foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    }
  }
}
