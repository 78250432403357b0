package graft.ops

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key tests positive") {
    val keys = (0 until 20000).map(i => s"key-$i-${i * 31}").toDF("s")
    val f = Bloom.build(keys, col("s"), numBits = 1 << 18)
    val misses = keys.filter(!Bloom.mightContain(f, col("s"))).count()
    assert(misses == 0, s"$misses inserted keys tested negative — " +
      "build/query hash drift (they must share the same expressions)")
  }

  test("false-positive rate stays near theory at 10 bits/key") {
    val n = 13000
    val f = Bloom.build((0 until n).map(i => s"in-$i").toDF("s"),
      col("s"), numBits = 1 << 17, numHashes = 5)
    // theoretical FP at m/n ~ 10, k=5: (1 - e^(-kn/m))^5 ~ 0.9%
    val probes = (0 until 50000).map(i => s"out-$i").toDF("s")
    val fp = probes.filter(Bloom.mightContain(f, col("s"))).count()
    val rate = fp.toDouble / 50000
    assert(rate < 0.03, f"FP rate $rate%.4f — expected < 3%% at 10 bits/key")
    assert(f.fillRatio > 0.2 && f.fillRatio < 0.6,
      s"fill ratio ${f.fillRatio} out of the healthy band for this sizing")
  }

  test("undersized filter saturates but never lies") {
    val keys = (0 until 5000).map(i => s"k$i").toDF("s")
    val f = Bloom.build(keys, col("s"), numBits = 64 * 4, numHashes = 5)
    assert(f.fillRatio > 0.9, "256 bits for 5000 keys should saturate")
    // saturation degrades FP toward 1.0 — but still zero false negatives
    assert(keys.filter(!Bloom.mightContain(f, col("s"))).count() == 0)
  }

  test("decontaminateBloom equals exact decontaminate on the fixture") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter(col("source") =!= "src9")
    val bench = docs.filter(col("source") === "src9")
    val exact = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text", 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val bloomed = TextAnalysis.decontaminateBloom(corpus, bench,
        "doc_id", "text", 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(exact == bloomed, "bloom prefilter changed the decon result")
    assert(exact.size < corpus.count(),
      "fixture must actually flag something or this test is vacuous")
  }

  test("membership test stays inside whole-stage codegen") {
    val docs = Tables.documents(spark, sf0001)
    val f = Bloom.build(docs.select(col("text").substr(1, 8).as("s")),
      col("s"), 1 << 12)
    val plan = docs.filter(Bloom.mightContain(f, col("text").substr(1, 8)))
      .queryExecution.executedPlan.toString
    // codegen'd spans print as "*(n) Filter" in the one-line plan; an
    // interpreted fallback (e.g. a HOF formulation) loses the star
    assert(plan.contains("*(1) Filter") || plan.contains("* Filter"),
      s"bloom probe must not break codegen:\n$plan")
  }
}
