package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r21 BuildMemo contract (VERDICT r20 task 3 — the memo was
  * unbounded): entries memoize (one build per key), checkpoint blocks
  * are SERIALIZED, the retained bytes are budget-bounded with
  * oldest-first eviction, and an evicted entry transparently rebuilds
  * on the next request. Eviction only drops the memo's REFERENCE — a
  * caller holding the old DataFrame keeps working (blocks free via the
  * ContextCleaner once unreachable), which is why eviction can never
  * break residualBuiltMemo-style holders.
  */
class BuildMemoSpec extends SparkSpec {

  private def bigDf(tag: Int) = {
    // ~1.6 MB of serialized long blocks per entry — big enough that two
    // entries overflow a 1 MiB budget, small enough to build instantly
    spark.range(200000L).select((col("id") + tag).as("id"))
  }

  test("memoizes: one build per (session, dir, key), same instance back") {
    var builds = 0
    def get() = BuildMemo.df(spark, "/memo/spec", "memoize_pin") {
      builds += 1; bigDf(0)
    }
    val a = get(); val b = get()
    assert(builds == 1, "second request must hit the memo")
    assert(a eq b, "hits must return the memoized instance")
    assert(BuildMemo.retainedBytes(spark) > 0L,
      "checkpoint blocks must be live and attributed")
  }

  test("checkpoint blocks are stored serialized") {
    // delta-based: the shared test session may hold other suites'
    // (legitimately deserialized) persists — only THIS build's new
    // blocks are pinned
    val before = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    BuildMemo.df(spark, "/memo/spec", "ser_pin") { bigDf(1) }
    val mine = spark.sparkContext.getRDDStorageInfo
      .filter(i => !before.contains(i.id) && i.memSize + i.diskSize > 0)
    assert(mine.nonEmpty, "the eager checkpoint must register live blocks")
    assert(mine.forall(!_.storageLevel.deserialized),
      s"memo blocks must be serialized (MEMORY_AND_DISK_SER), got: " +
        mine.map(_.storageLevel).mkString(", "))
  }

  test("evicts oldest past the byte budget and rebuilds on demand") {
    val prev = sys.props.get("spark.graft.memoBudgetMb")
    sys.props("spark.graft.memoBudgetMb") = "1" // two entries overflow
    try {
      var buildsA = 0
      def getA() = BuildMemo.df(spark, "/memo/spec", "evict_a") {
        buildsA += 1; bigDf(2)
      }
      getA()
      assert(buildsA == 1)
      // inserting B overflows the 1 MiB budget -> A (oldest) evicted;
      // B itself (newest) always survives, even alone over budget
      BuildMemo.df(spark, "/memo/spec", "evict_b") { bigDf(3) }
      getA() // must rebuild, not hit
      assert(buildsA == 2,
        "evicted entry must rebuild on the next request")
    } finally {
      prev match {
        case Some(v) => sys.props("spark.graft.memoBudgetMb") = v
        case None => sys.props.remove("spark.graft.memoBudgetMb")
      }
    }
  }
}
