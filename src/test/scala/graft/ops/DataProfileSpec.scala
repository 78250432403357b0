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

  test("profileSplit equals profile and contains no Expand") {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_returnflag", "l_linestatus")
    val li = Tables.lineitem(spark, sf0001)
    val a = DataProfile.profile(li, cols).collect().map(_.toSeq).toSet
    val b = DataProfile.profileSplit(li, cols).collect().map(_.toSeq).toSet
    assert(a == b)
    // the one-agg face Expands the corpus once per distinct; the split
    // face must not Expand anywhere
    val pSplit = DataProfile.profileSplit(li, cols)
      .queryExecution.executedPlan.toString
    assert(!pSplit.contains("Expand"), pSplit)
    val pOne = DataProfile.profile(li, cols)
      .queryExecution.executedPlan.toString
    assert(pOne.contains("Expand")) // the contrast the split face removes
  }

  test("unsupported column type fails loudly") {
    intercept[RuntimeException] {
      DataProfile.profile(Tables.lineitem(spark, sf0001), Seq("l_shipdate"))
    }
  }

  test("corrMatrix: exact +1/-1 on linear columns, hand value on a third") {
    import spark.implicits._
    // z chosen so corr(x, z) is hand-computable: x=1..4, z=(1,3,2,4)
    val df = Seq((1.0, 2.0, 1.0), (2.0, 4.0, 3.0), (3.0, 6.0, 2.0),
      (4.0, 8.0, 4.0)).toDF("x", "y", "z")
    val m = DataProfile.corrMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xy = m(("x", "y"))
    assert(xy.getLong(2) == 4 && xy.getDouble(3) == 1.0)
    assert(xy.getDouble(4) == 2.5) // cov_pop(x, 2x) = 2*var_pop(x) = 2*1.25
    // corr(x,z): n=4 sx=10 sz=10 sxz=(1+6+6+16)=29 sxx=30 szz=30
    // cov=4*29-100=16, vx=vz=4*30-100=20 -> corr=16/20=0.8
    assert(m(("x", "z")).getDouble(3) == 0.8)
  }

  test("corrMatrix: one aggregation pass — a single scan for all pairs") {
    val p = DataProfile.corrMatrix(Tables.lineitem(spark, sf0001),
      Seq("l_quantity", "l_extendedprice", "l_discount"))
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"corrMatrix must be one-pass, got:\n$p")
  }

  test("regression recovers an exact linear law per group") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 5.0), ("a", 2.0, 7.0), ("a", 3.0, 9.0),
      ("b", 1.0, 10.0), ("b", 2.0, 8.0), ("b", 4.0, 4.0))
      .toDF("g", "x", "y")
    val r = DataProfile.regression(df, "g", "x", "y")
      .collect().map(row => row.getString(0) -> row).toMap
    // a: y = 2x + 3 exactly
    assert(r("a").getDouble(2) == 2.0 && r("a").getDouble(3) == 3.0 &&
      r("a").getDouble(4) == 1.0)
    // b: y = -2x + 12 exactly
    assert(r("b").getDouble(2) == -2.0 && r("b").getDouble(3) == 12.0 &&
      r("b").getDouble(4) == 1.0)
  }

  test("equiWidthHistogram clamps out-of-range values into end buckets") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 25.0, 99.0, 140.0).toDF("v")
    val h = DataProfile.equiWidthHistogram(df, "v", 0L, 100L, 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(h(0).getLong(1) == 3)           // -5 clamps down, 0, 9.9
    assert(h(0).getDouble(2) == -5.0)
    assert(h(1).getLong(1) == 1 && h(2).getLong(1) == 1)
    assert(h(9).getLong(1) == 2)           // 99 plus clamped 140
    assert(h(9).getDouble(3) == 140.0)
    assert(h(0).getLong(4) == 0L && h(9).getLong(4) == 90L) // bucket_lo
  }

  test("equiDepthHistogram: ties stay together, totals conserved, " +
      "matches the single-partition rank rule") {
    import spark.implicits._
    // 100 rows over few distinct values with heavy ties
    val vals = (1 to 100).map(i => (i % 7).toDouble * 10 + 5)
    val df = vals.toDF("v")
    val h = DataProfile.equiDepthHistogram(df, "v", 0L, 100L, 4, coarse = 4)
      .collect().sortBy(_.getInt(0))
    assert(h.map(_.getLong(1)).sum == 100)
    // brute-force oracle: value-grouped rank_before, bucket = rb*4 div n
    val counts = vals.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
    var rb = 0L
    val expect = counts.map { case (v, c) =>
      val b = (rb * 4) / 100; rb += c; (v, b)
    }.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    h.foreach { r =>
      val b = r.getInt(0)
      assert(expect(b).min == r.getDouble(3) && expect(b).max == r.getDouble(4),
        s"bucket $b bounds mismatch")
    }
    // every distinct value appears in exactly one bucket
    assert(h.map(_.getLong(2)).sum == counts.size)
  }

  test("quantilesExact matches the sorted-sequence type-1 definition") {
    import spark.implicits._
    val vals = (1 to 97).map(_.toDouble * 1.5) // 97 rows, hits odd ranks
    val df = vals.toDF("v")
    val qs = DataProfile.quantilesExact(df, "v", 0L, 200L,
      Seq(1, 25, 50, 75, 100), coarse = 8)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val sorted = vals.sorted
    def expect(p: Int) = sorted(((97L * p + 99) / 100 - 1).toInt)
    Seq(1, 25, 50, 75, 100).foreach { p =>
      assert(qs(p)._1 == expect(p), s"p$p")
      assert(qs(p)._2 == (97L * p + 99) / 100)
    }
    // heavy ties: all-equal column -> every quantile is that value
    val tied = Seq.fill(50)(7.0).toDF("v")
    val tq = DataProfile.quantilesExact(tied, "v", 0L, 8L, Seq(50, 99),
      coarse = 4)
    assert(tq.collect().forall(_.getDouble(1) == 7.0))
  }

  test("poisson bootstrap CI: deterministic, ordered, brackets the sample mean") {
    import spark.implicits._
    // one key, 2000 rows, values 1..2000: the resample-mean spread at
    // n=2000 is ~ sd/sqrt(n) ≈ 13, so the 2nd..31st order statistics
    // of 32 resample means must bracket the true mean comfortably
    val df = (1 to 2000).map(i => ("k", i.toDouble, i.toLong))
      .toDF("key", "v", "id")
    val out = DataProfile.poissonBootstrapCi(df, "key", "v", "id", b = 32)
      .collect()
    assert(out.length == 1)
    val r = out.head
    val (bm, lo, hi, n) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4))
    assert(n == 32)
    assert(lo <= bm && bm <= hi, s"order: $lo $bm $hi")
    val trueMean = 1000.5
    assert(lo < trueMean && trueMean < hi,
      s"CI [$lo, $hi] must bracket $trueMean")
    assert(hi - lo < 200, s"CI width implausible: ${hi - lo}")
    // bit-identical on re-run (hash-derived weights, no RNG)
    val again = DataProfile.poissonBootstrapCi(df, "key", "v", "id", b = 32)
      .collect().head
    assert(again.getDouble(1) == bm && again.getDouble(2) == lo &&
      again.getDouble(3) == hi)
  }

  test("orderStatCi nulls the band below 4 resamples instead of inverting it") {
    import spark.implicits._
    // n=2 used to INVERT the band (rn=2 is the max, rn=n-1=1 the min)
    // and n=3 collapsed it to a point (ADVICE r18); below the floor
    // both bounds are NULL while boot_mean/n_resamples still report
    for (n <- 2 to 5) {
      val stats = (0 until n).map(b0 => ("k", b0, 10.0 + b0))
        .toDF("key", "resample", "mean")
      val r = DataProfile.orderStatCi(stats, Seq("key"), "mean", 32)
        .collect().head
      assert(r.getInt(4) == n)
      if (n < 4) {
        assert(r.isNullAt(2) && r.isNullAt(3),
          s"n=$n must null the band, got $r")
      } else {
        val (lo, hi) = (r.getDouble(2), r.getDouble(3))
        assert(lo <= hi && lo == 11.0 && hi == 10.0 + n - 2,
          s"n=$n band wrong: $r")
      }
    }
  }
}
