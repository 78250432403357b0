package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StringType

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("P1 castStrings casts present columns, skips absent, preserves nulls") {
    val df = Seq((1L, Some(2.0)), (2L, None)).toDF("a", "b")
    val out = Cleaning.castStrings(df, Seq("a", "b", "missing"))
    assert(out.schema("a").dataType == StringType)
    assert(out.schema("b").dataType == StringType)
    val rows = out.orderBy("a").collect()
    assert(rows(0).getString(0) == "1")
    assert(rows(1).isNullAt(1)) // null stays null, never the string "nan"
  }

  test("P2 standardizeLocations uppercases and derives location from country") {
    val df = Seq(
      (Some("ca"), Some("sf"), Some("usa")),
      (None, None, None)
    ).toDF("state", "city", "country")
    val out = Cleaning.standardizeLocations(df).collect().toSeq
    assert(out.contains(Row("CA", "SF", "USA", "USA")))
    assert(out.contains(Row(null, null, null, null))) // upper is null-safe
  }

  test("P3 recodeType: null->unknown, canonical->lower(trim), miss->other") {
    val df = Seq(Some(" Micro "), Some("MICRO"), Some("weird"), Some(""), None)
      .toDF("brewery_type")
    val out = Cleaning.recodeType(df, "brewery_type", Cleaning.StandardBreweryTypes)
      .as[String].collect().toSeq
    assert(out == Seq("micro", "micro", "other", "other", "unknown"))
  }

  test("P4 normalizeUrl: null/blank->null, schemeless->http://, scheme kept") {
    val df = Seq(None, Some(""), Some("   "), Some(" example.com "),
      Some("http://x.com"), Some("https://y.com"), Some("HTTP://Z.COM"))
      .toDF("website_url")
    val out = Cleaning.normalizeUrl(df, "website_url").as[Option[String]].collect().toSeq
    assert(out == Seq(None, None, None, Some("http://example.com"),
      Some("http://x.com"), Some("https://y.com"),
      // reference regex is case-sensitive: HTTP:// does NOT match ^https?://
      Some("http://HTTP://Z.COM")))
  }

  test("P5/P6 metadata columns are constant across the batch") {
    val df = Seq(1, 2, 3).toDF("x")
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val out = Cleaning.withProcessingMetadata(
      Cleaning.withIngestionMetadata(df, ts), "2026-01-01T00:00:00", "1.0")
    val distinct = out.select("ingestion_timestamp", "processed_at", "etl_version")
      .distinct().collect()
    assert(distinct.length == 1)
    assert(distinct(0) == Row(ts, "2026-01-01T00:00:00", "1.0"))
  }

  test("P7 fillMissing fills per-column defaults") {
    val df = Seq((Some("a"), Some(1.0)), (None, None)).toDF("s", "d")
    val out = Cleaning.fillMissing(df, Map("s" -> "missing", "d" -> 0.0))
      .collect().toSeq
    assert(out.contains(Row("missing", 0.0)))
  }
}
