package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class SourceSpec extends SparkSpec {

  private def rows(n: Int): Seq[String] =
    (1 to n).map(i => s"""{"id": $i}""")

  test("S1 extract loop: stops on the short page, one file per page") {
    val src = new FixtureBrewerySource(rows(25))
    val dir = Files.createTempDirectory("graft_src_").toString
    val files = Extractor.extract(src, dir, perPage = 10, batchTag = "t")
    assert(files.length == 3) // 10 + 10 + 5 (short -> stop)
    assert(files.forall(f => Files.exists(Paths.get(f))))
    assert(files.head.endsWith("breweries_t_page1.json"))
  }

  test("S1 extract loop: an exact multiple ends on the empty page") {
    val src = new FixtureBrewerySource(rows(20))
    val dir = Files.createTempDirectory("graft_src_").toString
    val files = Extractor.extract(src, dir, perPage = 10, batchTag = "t")
    assert(files.length == 2) // page 3 is empty -> not written
  }

  test("S5 landing lifecycle wipes previous contents") {
    val dir = Files.createTempDirectory("graft_land_")
    Files.writeString(dir.resolve("stale.json"), "[]")
    Extractor.prepareLandingDir(dir.toString)
    assert(Files.list(dir).count() == 0)
  }

  test("top-level JSON array counting ignores nested objects and strings") {
    assert(Extractor.countTopLevelObjects("""[]""") == 0)
    assert(Extractor.countTopLevelObjects("""[{"a":1},{"b":2}]""") == 2)
    assert(Extractor.countTopLevelObjects("""[{"a":{"nested":{}}}]""") == 1)
    assert(Extractor.countTopLevelObjects("""[{"s":"fake } brace {"}]""") == 1)
    assert(Extractor.countTopLevelObjects("""[{"s":"esc\" }"}]""") == 1)
  }

  test("S2 retry: succeeds after transient failures, sleeping between tries") {
    var calls = 0
    var sleeps = Vector.empty[Long]
    val src = new HttpBrewerySource("http://unused", maxRetries = 3,
      backoffMillis = 123, sleeper = s => sleeps :+= s,
      getOverride = Some { _ =>
        calls += 1
        if (calls < 3) throw new RuntimeException("flaky") else """[{"ok":1}]"""
      })
    assert(src.fetchPage(1, 10) == """[{"ok":1}]""")
    assert(calls == 3 && sleeps == Vector(123L, 123L))
  }

  test("S2 retry: exhaustion rethrows with the last cause") {
    val src = new HttpBrewerySource("http://unused", maxRetries = 2,
      backoffMillis = 1, sleeper = _ => (),
      getOverride = Some(_ => throw new RuntimeException("down")))
    val e = intercept[RuntimeException](src.fetchPage(1, 10))
    assert(e.getMessage.contains("after 2 attempts"))
    assert(e.getCause.getMessage == "down")
  }

  test("S10 read-back verification counts rows and measures bytes") {
    val dir = Files.createTempDirectory("graft_rb_").toString
    import spark.implicits._
    Seq(1, 2, 3).toDF("x").write.mode("overwrite").parquet(dir)
    val (n, bytes) = Extractor.readBack(spark, dir)
    assert(n == 3 && bytes > 0)
  }
}
