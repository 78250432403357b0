package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted group-count equals the direct aggregation on skewed data") {
    // 90% of rows share one hot key — the shape salting exists for
    val df = (1 to 1000).map(i =>
      (if (i <= 900) "HOT" else s"k${i % 7}", i.toLong)).toDF("k", "id")
    val direct = Aggregations.groupCount(df, Seq("k"), "cnt")
      .as[(String, Long)].collect().toSet
    val salted = Skew.saltedGroupCount(df, Seq("k"), "id", salts = 8, "cnt")
      .as[(String, Long)].collect().toSet
    assert(salted == direct)
  }

  test("salted join equals the plain join, row for row") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
      .agg(count(lit(1)), sum(expr("l_quantity * o_totalprice")))
      .first()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "l_quantity", salts = 4)
      .agg(count(lit(1)), sum(expr("l_quantity * o_totalprice")))
      .first()
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }
}
