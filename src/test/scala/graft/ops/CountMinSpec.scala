package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("estimates never under-count (the one-sided guarantee)") {
    val ev = Tables.events(spark, sf0001)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
    val est = CountMin.estimate(exact.select("user_id"), "user_id",
      CountMin.build(ev, "user_id"))
    val bad = exact.join(est, "user_id")
      .filter(col("est") < col("exact_n")).count()
    assert(bad == 0)
  }

  test("sketches merge by counter addition — partials equal the whole") {
    val ev = Tables.events(spark, sf0001)
    val a = CountMin.build(ev.filter(col("event_id") % 2 === 0), "user_id")
    val b = CountMin.build(ev.filter(col("event_id") % 2 =!= 0), "user_id")
    val merged = a.unionByName(b)
      .groupBy("row_i", "bucket").agg(sum(col("cnt")).as("cnt"))
    val whole = CountMin.build(ev, "user_id")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("a narrow sketch over-counts, a key never seen estimates zero") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c"))
      .toDF("k")
    // width 1: every key collides into the one counter per row
    val tiny = CountMin.build(df, "k", width = 1, depth = 3)
    val est = CountMin.estimate(Seq("a").toDF("k"), "k", tiny,
      width = 1, depth = 3)
    assert(est.head.getLong(1) == 60) // all 60 rows in the single cell
    // at a real width, an absent key misses at least one cell -> est 0
    val sk = CountMin.build(df, "k")
    val miss = CountMin.estimate(Seq("never-seen").toDF("k"), "k", sk)
    assert(miss.head.getLong(1) == 0)
  }
}
