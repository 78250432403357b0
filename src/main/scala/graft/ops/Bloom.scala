package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size Bloom filter over a string column, built distributed and
  * queried as a pure codegen'd expression — the constant-memory
  * prefilter that replaces a benchmark-sized broadcast with a few
  * hundred KB of bits on membership-style joins (decontamination being
  * the canonical one: see [[TextAnalysis.decontaminateBloom]]).
  *
  * Design notes:
  * - Bit indices are Kirsch–Mitzenmacher double hashing
  *   (g_j = h1 + j*h2 mod m) over Spark's own `xxhash64` — and the SAME
  *   Column expressions compute indices on the build side and the query
  *   side, so the two can never disagree (no Scala-side hash
  *   reimplementation to drift).
  * - The build is a `treeAggregate` of fixed-size Array[Long] bit
  *   words: executor state is `numBits/8` bytes per partition
  *   REGARDLESS of input size — this is the operator's whole point at
  *   100 TB. (Spark's own `df.stat.bloomFilter` exists; this one keeps
  *   the hash pipeline inside Catalyst expressions so membership tests
  *   compile into whole-stage codegen instead of calling into a
  *   serialized sketch object per row.)
  * - `mightContain` unrolls the k probes into a plain conjunction of
  *   `getbit(element_at(bits, idx/64+1), idx%64)` checks over a FOLDED
  *   array literal — no higher-order functions (which fall back to
  *   interpreted eval), no UDFs. False positives possible (callers must
  *   re-verify when exactness matters), false negatives impossible.
  */
object Bloom {

  /** Second-hash salt: any fixed string distinct from the unsalted
    * column makes h2 independent of h1 under xxhash64.
    */
  private val Salt = "graft-bloom-2"

  final case class Filter(words: Array[Long], numHashes: Int) {
    def numBits: Long = words.length * 64L
    /** Occupancy — the honest health check: a filter sized too small
      * for its key count saturates toward all-ones and stops filtering
      * (FP rate -> 1) without ever being WRONG. Callers log/act on this.
      */
    def fillRatio: Double =
      words.map(java.lang.Long.bitCount(_).toLong).sum.toDouble / numBits
  }

  /** Bit index of probe `j` for string column `c` (shared by build and
    * query — the no-drift invariant). Both hashes are reduced mod m
    * BEFORE combining: ANSI mode (Spark 4's default) faults on long
    * overflow, so the usual wrap-and-hope h1 + j*h2 is not an option;
    * the stepped form g_j = (h1%m + j*(h2%(m-1)+1)) % m keeps every
    * intermediate under ~6m and the +1 keeps the step nonzero.
    */
  private def bitIndex(c: Column, j: Int, numBits: Long): Column = {
    val h1 = pmod(xxhash64(c), lit(numBits))
    val step = pmod(xxhash64(lit(Salt), c), lit(numBits - 1)) + lit(1L)
    pmod(h1 + lit(j.toLong) * step, lit(numBits))
  }

  /** Build over `df`'s column `c` (strings). `numBits` must be a
    * multiple of 64; size it at ~10 bits/key for ~1% FP with 5 hashes.
    */
  def build(df: DataFrame, c: Column, numBits: Int, numHashes: Int = 5): Filter = {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val idxCols = (0 until numHashes).map(j => bitIndex(c, j, numBits.toLong))
    val words = df.select(explode(array(idxCols: _*)).as("idx"))
      .select(col("idx")).rdd.map(_.getLong(0))
      .treeAggregate(new Array[Long](numBits / 64))(
        (arr, i) => { arr((i >>> 6).toInt) |= 1L << (i & 63); arr },
        (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
    Filter(words, numHashes)
  }

  /** Membership test as a single codegen'd boolean Column. */
  def mightContain(f: Filter, c: Column): Column = {
    val bits = typedlit(f.words.toSeq)
    (0 until f.numHashes).map { j =>
      val idx = bitIndex(c, j, f.numBits)
      val word = element_at(bits, (floor(idx / 64)).cast("int") + 1)
      call_function("getbit", word, pmod(idx, lit(64L)).cast("int")) === 1
    }.reduce(_ && _)
  }
}
