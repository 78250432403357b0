package graft.sources

import graft.{SparkSpec, Tables}
import java.nio.file.Files

class BucketedSpec extends SparkSpec {

  test("co-bucketed tables join without a shuffle exchange") {
    val base = Files.createTempDirectory("graft_bucket_").toString
    val orders = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    BucketedTables.writeBucketed(orders, "b_orders", s"$base/orders",
      "o_orderkey", 4)
    BucketedTables.writeBucketed(lineitem, "b_lineitem", s"$base/lineitem",
      "o_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the bucketing is what's being tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.colocatedJoin(spark, "b_orders",
        "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free co-located join, got:\n$plan")
      assert(joined.count() == lineitem.count()) // FK join preserves rows
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
