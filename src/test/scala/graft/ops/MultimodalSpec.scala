package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")

  test("media wrapping: utf-8 payload with typed metadata columns") {
    val m = Multimodal.documentsAsMedia(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    val out = Multimodal.mediaMeta(m)
      .as[(Long, Int, String, String, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 11)
    assert(out(1L)._3 == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(out(1L)._4 == "68656C6C6F20776F".toUpperCase) // "hello wo" hex
    assert(out(2L)._2 == 1)
  }

  test("fake features are deterministic and normalized to [0,1]") {
    val f1 = Multimodal.fakeFeatures(Multimodal.documentsAsMedia(docs))
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    val f2 = Multimodal.fakeFeatures(Multimodal.documentsAsMedia(docs))
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(f1.toSeq == f2.toSeq)
    f1.foreach { r =>
      Seq(r._2, r._3, r._4, r._5).foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
  }

  test("decode stub: partition-wise batch path with declared schema") {
    val out = Multimodal.decodeFeatures(spark,
      Multimodal.documentsAsMedia(docs)).collect()
    assert(out.length == 2)
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getInt(1) >= 1) // n_frames
    val feat = r1.getSeq[Float](2)
    assert(feat.length == 4 && feat.forall(f => f >= 0f && f <= 1f))
    // deterministic: same payload -> same features
    val again = Multimodal.decodeFeatures(spark,
      Multimodal.documentsAsMedia(docs)).collect()
      .find(_.getLong(0) == 1L).get.getSeq[Float](2)
    assert(again == feat)
  }

  test("decoder handles null/empty payloads without failing the batch") {
    val d = new MediaDecoder
    assert(d.decode(null) == ((0, Seq(0f, 0f, 0f, 0f))))
    assert(d.decode(Array.emptyByteArray)._1 == 0)
  }
}
