package graft.ops

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (Some("1"), Some("micro"), "keep"),
    (None, Some("nano"), "quarantine: null id"),
    (Some("3"), None, "quarantine: null type"),
    (None, None, "quarantine: both null")
  ).toDF("id", "brewery_type", "note")

  test("F1 nullKeySplit routes any-null-key rows to quarantine with reason") {
    val (valid, quarantine) = Quality.nullKeySplit(frame, Seq("id", "brewery_type"))
    assert(valid.count() == 1)
    assert(quarantine.count() == 3)
    assert(quarantine.columns.contains("quarantine_reason"))
    assert(quarantine.columns.contains("quarantine_timestamp"))
    assert(quarantine.select("quarantine_reason").distinct().as[String].collect()
      .toSeq == Seq("missing_key_values"))
    // conservation: every input row lands on exactly one side
    assert(valid.count() + quarantine.count() == frame.count())
  }

  test("F2 requireColumns raises listing the missing set") {
    Quality.requireColumns(frame, Seq("id", "note"))
    val e = intercept[IllegalArgumentException] {
      Quality.requireColumns(frame, Seq("id", "nope", "also_nope"))
    }
    assert(e.getMessage.contains("also_nope, nope"))
  }

  test("F3 duplicateIds finds multiplicities > 1") {
    val df = Seq("a", "a", "a", "b", "c", "c").toDF("id")
    val dups = Quality.duplicateIds(df).as[(String, Long)].collect().toMap
    assert(dups == Map("a" -> 3L, "c" -> 2L))
    assert(Quality.duplicateIdCount(df) == 3) // 6 rows - 3 distinct
  }

  test("F3 duplicateIdCount counts the null group like pandas duplicated()") {
    val df = Seq(Some("a"), Some("a"), None, None, None, Some("b"))
      .toDF("id")
    // pandas: a,a -> 1 dup; NaN,NaN,NaN -> 2 dups; b -> 0  == 3
    assert(Quality.duplicateIdCount(df) == 3)
    assert(Quality.duplicateIdCount(Seq.empty[Option[String]].toDF("id")) == 0)
  }

  test("A7 nullCounts counts per-column nulls in one pass") {
    val counts = Quality.nullCounts(frame, Seq("id", "brewery_type", "note"))
      .collect()(0)
    assert(counts.getLong(0) == 2)
    assert(counts.getLong(1) == 2)
    assert(counts.getLong(2) == 0)
  }
}
