package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: the N/(k+1) guarantee must hold for every
  * (skew, k, parallelism) combination — partition summaries and the
  * candidate merge are both in play when numPartitions > 1.
  */
class HeavyHittersSpec extends SparkSpec {

  /** Zipf-ish corpus: key i gets ~C/i rows — a planted power law with
    * known exact counts, 200 distinct keys. */
  private def zipf(parts: Int): DataFrame = {
    import spark.implicits._
    val rows = for {
      i <- 1 to 200
      _ <- 1 to (2000 / i)
    } yield s"key_$i"
    // deterministic interleave so partitions see mixed key order (a
    // sorted layout would hand each partition one run per key)
    rows.sortBy(_.hashCode).toDF("k").repartition(parts)
  }

  private def exactCounts(df: DataFrame): Map[String, Long] =
    df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every true heavy hitter survives, bound holds: k x parallelism sweep") {
    for (parts <- Seq(1, 4, 13); k <- Seq(4, 16, 64)) {
      val df = zipf(parts)
      val n = df.count()
      val exact = exactCounts(df)
      val est = HeavyHitters.misraGries(df, "k", k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.size <= k, s"parts=$parts k=$k: ${est.size} candidates")
      val heavy = exact.filter { case (_, c) => c * (k + 1) > n }
      for ((key, cnt) <- heavy) {
        assert(est.contains(key),
          s"parts=$parts k=$k: true heavy hitter $key (cnt=$cnt) lost")
      }
      for ((key, e) <- est) {
        val t = exact(key)
        assert(e <= t, s"parts=$parts k=$k: $key overcounted ($e > $t)")
        assert((t - e) * (k + 1) <= n,
          s"parts=$parts k=$k: $key undercount ${t - e} blows N/(k+1)")
      }
    }
  }

  test("audit face: all flags true on the planted Zipf, for all k") {
    for (k <- Seq(8, 32)) {
      val rows = HeavyHitters.audit(zipf(7), "k", k).collect()
      assert(rows.nonEmpty, s"k=$k: audit emitted no heavy hitters")
      assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3)),
        s"k=$k: audit flag flipped red")
    }
  }

  test("deterministic under a fixed partitioning: two runs agree") {
    val df = zipf(5)
    val a = HeavyHitters.misraGries(df, "k", 16).collect().toSet
    val b = HeavyHitters.misraGries(df, "k", 16).collect().toSet
    assert(a == b)
  }

  test("sketch plan: one partition pass + candidate-sized merge, never a keyspace group-by") {
    val p = HeavyHitters.misraGries(zipf(4), "k", 16)
      .queryExecution.executedPlan.toString
    // the input reaches the sketch through EXACTLY ONE mapPartitions
    // pass (a scalar-subquery offset would replay the scan+sketch twice
    // — the bug this pin caught), and the only hash exchange is over
    // <= k*P summary rows
    assert("MapPartitions".r.findAllIn(p).length == 1,
      s"sketch input must be scanned exactly once:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1,
      s"merge must shuffle candidate summaries once:\n$p")
  }

  test("fewer distinct keys than k: sketch is exact") {
    import spark.implicits._
    val df = (1 to 300).map(i => s"k${i % 5}").toDF("k").repartition(3)
    val est = HeavyHitters.misraGries(df, "k", 16).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exactCounts(df))
  }
}
