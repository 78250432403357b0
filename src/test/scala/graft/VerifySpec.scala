package graft

import org.apache.spark.sql.functions.lit

/** End-to-end guard on the Verify harness's failure path: a broken
  * declared query must SURFACE as an `__error` artifact the driver's
  * compare will flag, never vanish from the correctness gate (round 12:
  * `events_range_join` died at analysis and CORRECTNESS looked all-green
  * with one row silently missing).
  */
class VerifySpec extends SparkSpec {

  test("planted broken query produces a visible __error artifact") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_err_").toString
    val err = Verify.dumpOne(spark, sf0001, out, "planted_broken",
      (_, _) => throw new RuntimeException("planted failure"))
    assert(err.exists(_.contains("planted failure")))
    val dumped = spark.read.parquet(s"$out/planted_broken")
    assert(dumped.columns.toSeq == Seq("__error"))
    assert(dumped.count() == 1)
    assert(dumped.head.getString(0).contains("planted failure"))
  }

  test("analysis-time failure (not just runtime) is also captured") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_err_").toString
    // unresolved column -> AnalysisException at plan time, the exact
    // failure class that went invisible in round 12
    val err = Verify.dumpOne(spark, sf0001, out, "planted_analysis",
      (s, dir) => Tables.events(s, dir).select("no_such_column"))
    assert(err.isDefined)
    assert(spark.read.parquet(s"$out/planted_analysis")
      .columns.toSeq == Seq("__error"))
  }

  test("healthy query dumps its result, not an error artifact") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_ok_").toString
    val err = Verify.dumpOne(spark, sf0001, out, "planted_ok",
      (s, _) => s.range(3).toDF("id").withColumn("v", lit(1)))
    assert(err.isEmpty)
    val dumped = spark.read.parquet(s"$out/planted_ok")
    assert(dumped.columns.toSet == Set("id", "v") && dumped.count() == 3)
  }
}
