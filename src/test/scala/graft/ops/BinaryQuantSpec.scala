package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  test("packing: known sign pattern lands in the right bits") {
    val v = Array.tabulate(64)(i =>
      if (i == 0 || i == 2 || i == 33) 1.0f else -1.0f)
    val got = Seq((1L, v)).toDF("vec_id", "embedding")
    val r = Similarity.quantizeBinary(got).select("b1", "b2").collect().head
    assert(r.getLong(0) == 5L, s"b1 was ${r.getLong(0)}") // bits 0 + 2
    assert(r.getLong(1) == 2L, s"b2 was ${r.getLong(1)}") // bit 33 -> word 2 bit 1
  }

  test("hamming + rerank recovers most of the exact top-10") {
    val e = Tables.embeddings(spark, sf0001)
    val pred = col("vec_id") % 100 === 0
    val exact = Similarity.bruteForceTopK(e, pred, 10)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bin = Similarity.bruteForceTopKBinary(e, pred, k = 10, rerank = 40)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bin & exact).size.toDouble / exact.size
    info(f"binary@40-rerank recall vs exact top-10: $recall%.3f")
    assert(recall >= 0.5, f"recall $recall%.3f under the floor")
  }
}
