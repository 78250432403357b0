package graft.ops

import graft.{SparkSpec, Tables}
import graft.pipeline.Breweries
import org.apache.spark.sql.functions._

class AggregationsSpec extends SparkSpec {
  import spark.implicits._

  test("A1 groupCount = COUNT(*) per key tuple with caller-named column") {
    val df = Seq(("x", "a"), ("x", "a"), ("x", "b"), ("y", "a")).toDF("k1", "k2")
    val out = Aggregations.groupCount(df, Seq("k1", "k2"), "n")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("x", "a", 2L), ("x", "b", 1L), ("y", "a", 1L)))
  }

  test("A2/A3 gold invariants: counts sum to silver rows; A2 refines A3") {
    val silver = Breweries.silver(spark, sf0001).cache()
    val byType = Aggregations.goldByTypeLocation(silver)
    val byLoc = Aggregations.goldByLocation(silver)
    val total = silver.count()
    assert(byType.agg(sum("brewery_count")).as[Long].head() == total)
    assert(byLoc.agg(sum("brewery_count")).as[Long].head() == total)
    // rolling A2 up over brewery_type reproduces A3 exactly
    val rolled = byType.groupBy("location", "state", "city")
      .agg(sum("brewery_count").as("brewery_count"))
    assert(rolled.except(byLoc.select("location", "state", "city", "brewery_count")).isEmpty)
    silver.unpersist()
  }

  test("A4 exact distinct count matches distinct().count()") {
    val li = Tables.lineitem(spark, sf0001)
    assert(Aggregations.distinctCount(li, "l_returnflag") == 3)
  }

  test("A5 valueCounts orders by frequency desc") {
    val df = Seq("a", "b", "b", "b", "c", "c").toDF("v")
    val out = Aggregations.valueCounts(df, "v").as[(String, Long)].collect().toSeq
    assert(out == Seq(("b", 3L), ("c", 2L), ("a", 1L)))
  }

  test("F1+silver conservation on fixtures: valid + quarantine = bronze") {
    val bronze = Breweries.bronze(spark, sf0001).cache()
    val (valid, quarantine) = Quality.nullKeySplit(bronze, Breweries.KeyFields)
    assert(valid.count() + quarantine.count() == bronze.count())
    bronze.unpersist()
  }

  test("A4 scale path: approxDistinct lands within the HLL error band") {
    val df = graft.Tables.lineitem(spark, sf0001)
    val exact = Aggregations.distinctCount(df, "l_orderkey")
    val approx = Aggregations.approxDistinct(df, "l_orderkey", rsd = 0.01)
      .as[Long].head()
    // HLL++ at rsd=0.01: allow a generous 5% band (error is probabilistic)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
    assert(Aggregations.rowCount(df) == df.count())
  }

  test("skyline2D equals the brute-force dominance check, ties survive together") {
    import spark.implicits._
    // frontier (1,9),(3,5),(5,5 dominated by (3,5)), (5,2); duplicate
    // frontier point (3,5) twice — both survive; (4,5) dominated by
    // (3,5) strictly on x; (3,7) dominated within its own x group
    val rows = Seq((1L, 1, 9.0), (2L, 3, 5.0), (3L, 3, 5.0), (4L, 4, 5.0),
      (5L, 5, 2.0), (6L, 5, 5.0), (7L, 3, 7.0), (8L, 2, 9.0), (9L, 6, 1.0))
    val df = rows.toDF("id", "x", "y")
    val brute = rows.filterNot { case (_, x, y) =>
      rows.exists { case (_, x2, y2) =>
        x2 <= x && y2 <= y && (x2 < x || y2 < y) }
    }.map(_._1).toSet
    val got = Aggregations.skyline2D(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == brute, s"got $got want $brute")
    assert(got == Set(1L, 2L, 3L, 5L, 9L))
  }

  test("skyline2D on continuous x matches brute force; NULL rows survive (NOT EXISTS)") {
    import spark.implicits._
    // 500 pseudo-random continuous (x, y) doubles — enough to spread
    // across many coarse buckets and exercise the cross-bucket carry
    val rows = (1 to 500).map { i =>
      val x = ((i * 2654435761L) % 1000003).toDouble / 997.0
      val y = ((i * 40503L + 7) % 1000033).toDouble / 991.0
      (i.toLong, x, y)
    }
    val brute = rows.filterNot { case (_, x, y) =>
      rows.exists { case (_, x2, y2) =>
        x2 <= x && y2 <= y && (x2 < x || y2 < y) }
    }.map(_._1).toSet
    val df = rows.toDF("id", "x", "y")
    val got = Aggregations.skyline2D(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == brute, s"got ${got.size} want ${brute.size}")
    // NULL x or y: no dominator can exist (NULL comparisons never
    // hold), so the row passes through — the NOT-EXISTS oracle's
    // semantics, not silent dropping
    val withNulls = df.unionByName(Seq(
      (9001L, Option.empty[Double], Option(0.0)),
      (9002L, Option(0.0), Option.empty[Double]))
      .toDF("id", "x", "y"))
    val got2 = Aggregations.skyline2D(withNulls, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got2 == brute ++ Set(9001L, 9002L), s"nulls must survive")
    // grouped face: null GROUP key rows survive too, and per-group
    // frontiers are unaffected
    val g = Seq(("a", 1, 1.0), ("a", 2, 2.0), (null, 5, 5.0))
      .toDF("g", "x", "y")
    val gotG = Aggregations.skyline2DBy(g, Seq("g"), "x", "y")
      .select("x").collect().map(_.getInt(0)).toSet
    assert(gotG == Set(1, 5), s"got $gotG")
  }

  test("skyline2D above the cheap-path bound (large path) matches the sweep oracle") {
    import spark.implicits._
    // >SkylineSmallMaxRows distinct x, so the r19 dispatch routes onto
    // the coarse-bucket machinery (the 500-row tests above now cover
    // the small window path); the oracle is an independent O(n log n)
    // sweep — a row survives iff it is its x-group's min y AND strictly
    // beats the running min over all smaller x
    val rows = (1 to 12000).map { i =>
      val x = ((i * 2654435761L) % 1000003).toDouble / 997.0
      val y = ((i * 40503L + 7) % 1000033).toDouble / 991.0
      (i.toLong, x, y)
    }
    val want = scala.collection.mutable.Set[Long]()
    var runMin = Double.MaxValue
    for ((x, g) <- rows.groupBy(_._2).toSeq.sortBy(_._1)) {
      val gmin = g.map(_._3).min
      if (gmin < runMin) want ++= g.filter(_._3 == gmin).map(_._1)
      runMin = math.min(runMin, gmin)
    }
    val got = Aggregations.skyline2D(rows.toDF("id", "x", "y"), "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want.toSet, s"got ${got.size} want ${want.size}")
  }

  test("grouped skyline above the cheap-path bound matches the per-group sweep") {
    import spark.implicits._
    // 3 groups x ~4k distinct x = >10k (group, x) rows: the grouped
    // large path (global value-range bounds, per-(group, bucket)
    // windows, equi-join carry) against the same sweep run per group
    val rows = (1 to 12000).map { i =>
      val grp = s"g${i % 3}"
      val x = ((i * 2654435761L) % 999983).toDouble / 991.0
      val y = ((i * 40503L + 11) % 999979).toDouble / 997.0
      (i.toLong, grp, x, y)
    }
    val want = scala.collection.mutable.Set[Long]()
    for ((_, grows) <- rows.groupBy(_._2)) {
      var runMin = Double.MaxValue
      for ((x, g) <- grows.groupBy(_._3).toSeq.sortBy(_._1)) {
        val gmin = g.map(_._4).min
        if (gmin < runMin) want ++= g.filter(_._4 == gmin).map(_._1)
        runMin = math.min(runMin, gmin)
      }
    }
    val got = Aggregations.skyline2DBy(rows.toDF("id", "g", "x", "y"),
        Seq("g"), "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want.toSet, s"got ${got.size} want ${want.size}")
  }

  test("grouped skyline on continuous x with a hot group matches brute force") {
    import spark.implicits._
    // one HOT group holds 80% of the rows (the grouped twin of the
    // continuous-x hazard: its frontier scan must ride the per-(group,
    // bucket) windows, not one per-group sort)
    val rows = (1 to 400).map { i =>
      val grp = if (i % 5 != 0) "hot" else s"g${i % 3}"
      val x = ((i * 2654435761L) % 999983).toDouble / 991.0
      val y = ((i * 40503L + 11) % 999979).toDouble / 997.0
      (i.toLong, grp, x, y)
    }
    val brute = rows.filterNot { case (_, g0, x, y) =>
      rows.exists { case (_, g2, x2, y2) =>
        g2 == g0 && x2 <= x && y2 <= y && (x2 < x || y2 < y) }
    }.map(_._1).toSet
    val got = Aggregations.skyline2DBy(rows.toDF("id", "g", "x", "y"),
        Seq("g"), "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == brute, s"got ${got.size} want ${brute.size}")
  }
}
