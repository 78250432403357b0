package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row

class DataProfileSpec extends SparkSpec {

  test("nulls, distincts and means on a planted frame") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, String)](
      (1.0, "a"), (2.0, "b"), (null, "b"), (4.0, null), (3.0, "c"))
      .toDF("x", "s")
    val rows = DataProfile.profile(df, Seq("x", "s"))
      .collect().map(r => r.getString(0) -> r).toMap

    val x = rows("x")
    assert(x.getLong(1) == 5 && x.getLong(2) == 1)      // n, n_null
    assert(x.getLong(3) == 4)                           // n_distinct
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 4.0)
    assert(x.getDouble(6) == 2.5)                       // mean of 1,2,4,3
    assert(x.isNullAt(7) && x.isNullAt(8))

    val s = rows("s")
    assert(s.getLong(1) == 5 && s.getLong(2) == 1 && s.getLong(3) == 3)
    assert(s.isNullAt(4) && s.isNullAt(5) && s.isNullAt(6))
    assert(s.getString(7) == "a" && s.getString(8) == "c")
  }

  test("six profiled columns still read the table exactly once") {
    val p = DataProfile.profile(Tables.lineitem(spark, sf0001),
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag", "l_linestatus"))
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"profiler must be one-pass, got multiple scans:\n$p")
  }

  test("unsupported column type fails loudly") {
    intercept[RuntimeException] {
      DataProfile.profile(Tables.lineitem(spark, sf0001), Seq("l_shipdate"))
    }
  }
}
