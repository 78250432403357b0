package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-engine hashed logistic-regression quality classifier: fixed-
  * iteration determinism, first-step closed form, and separable-corpus
  * behavior.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "good clean prose text", 1),
    (2L, "good solid prose here", 1),
    (3L, "spam junk noise garbage", 0),
    (4L, "junk spam garbage words", 0)
  ).toDF("doc_id", "text", "y")

  test("one GD step from zero matches the closed form") {
    val w1 = QualityModel.trainHashedLogReg(docs, "doc_id", "text",
      col("y"), dim = 64, lr = 0.5, iters = 1)
      .as[(Int, Double)].collect().toMap
    // with w = 0 every p is exactly 0.5, so w1_f = -lr * round(
    //   sum(0.5 - y over docs with f) / n, 6) — recompute from the sketch
    val sk = QualityModel.featureSketch(docs, "doc_id", "text", col("y"), 64)
    val expected = sk.groupBy("feature")
      .agg(QualityModel.grid6(sum(lit(0.5) - col("y")) / lit(4.0)).as("g"))
      .select(col("feature"),
        QualityModel.grid6(lit(0.0) - lit(0.5) * col("g")).as("w"))
      .as[(Int, Double)].collect().toMap
    assert(w1 == expected && w1.nonEmpty)
    // the balanced toy corpus zeroes the bias; class tokens pull +/-
    assert(w1(-1) == 0.0)
    assert(w1.values.exists(_ > 0) && w1.values.exists(_ < 0))
  }

  test("separable toy corpus: scores order by class, predictions correct") {
    val w = QualityModel.trainHashedLogReg(docs, "doc_id", "text",
      col("y"), dim = 64, lr = 0.5, iters = 3)
    val scored = QualityModel.scoreHashedLogReg(docs, "doc_id", "text", w, 64)
      .as[(Long, Double, Int)].collect().map(r => r._1 -> r).toMap
    assert(scored(1L)._2 > 0.5 && scored(2L)._2 > 0.5)
    assert(scored(3L)._2 < 0.5 && scored(4L)._2 < 0.5)
    assert(scored(1L)._3 == 1 && scored(3L)._3 == 0)
  }

  test("training is deterministic across runs") {
    def run() = QualityModel.trainHashedLogReg(docs, "doc_id", "text",
      col("y"), dim = 64, lr = 0.5, iters = 3)
      .as[(Int, Double)].collect().toMap
    assert(run() == run())
  }
}
