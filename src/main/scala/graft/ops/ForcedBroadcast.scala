package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Byte-sized guard for FORCED broadcasts (ADVICE r18). Operators that
  * force a broadcast above Spark's auto threshold (the triangle-closing
  * edge list, the ungrouped skyline frontier) used bare ROW-COUNT
  * guards, but a broadcast's driver cost is BYTES: the relation is
  * collected to the driver and roughly doubled while the hashed
  * relation is built, so 4M rows of a wide relation can OOM a small
  * driver that 4M narrow rows would not. This guard multiplies the
  * caller's (already materialized — every call site counts a
  * checkpointed relation) row count by an estimated hashed-row width
  * and compares against a cap sized from the DRIVER's heap — one tenth
  * of `Runtime.maxMemory`, overridable with
  * `spark.graft.forcedBroadcastMaxBytes` for deployments that know
  * better. On the 128 GiB bench JVM both call sites keep their
  * broadcasts exactly as before; on a 1 GiB driver the same 4M rows now
  * correctly fall back to the shuffle join.
  *
  * The heap-derived cap is additionally CLAMPED below Spark's hard
  * BroadcastExchange limits (8 GB of hashed-relation bytes, 512M rows):
  * on a big driver heap/10 can exceed 8 GB, and a broadcast this guard
  * approved would then fail the whole job with "Cannot broadcast a
  * table larger than 8GB" instead of taking the shuffle fallback — the
  * guard must always trip BEFORE Spark's own limit can. 7 GB leaves
  * headroom for Spark's hashed-relation overhead beyond our per-row
  * estimate. An explicit `spark.graft.forcedBroadcastMaxBytes` is
  * still clamped the same way: the config exists to LOWER the cap for
  * small drivers, never to opt into a broadcast Spark itself rejects.
  */
object ForcedBroadcast {

  /** Spark's BroadcastExchangeExec fails outright past 8 GB / 512M rows
    * (`MAX_BROADCAST_TABLE_BYTES` / `MAX_BROADCAST_TABLE_ROWS`); stay
    * under both so the fallback is ours, not a job failure.
    */
  private val HardByteClamp: Long = 7L << 30
  private val HardRowClamp: Long  = 400L * 1000 * 1000

  /** The configurable cap (bytes), clamped under Spark's hard limit. */
  def capBytes(df: DataFrame): Long = {
    val requested =
      df.sparkSession.conf.getOption("spark.graft.forcedBroadcastMaxBytes")
        .map(_.toLong)
        .getOrElse(Runtime.getRuntime.maxMemory() / 10)
    math.min(requested, HardByteClamp)
  }

  /** `broadcast(df)` when `rows × rowBytes` fits the cap, else `df`
    * itself (the shuffle join is the right plan past broadcast size —
    * loud, never silent). `rowBytes` is the caller's estimate of one
    * hashed row on the driver: unsafe-row payload plus hash-table entry
    * overhead.
    */
  def orShuffle(df: DataFrame, rows: Long, rowBytes: Long,
                label: String): DataFrame =
    orShuffleTotal(df, rows, rows * rowBytes, label)

  /** Same guard, but the caller supplies the TOTAL byte estimate
    * directly — for relations whose row width is data-dependent
    * (variable-length array payloads) where a flat per-row constant
    * can under-price the broadcast by 10×+. Callers derive `est` from
    * data they already materialized (e.g. Σ token lengths over a
    * persisted tf relation).
    */
  def orShuffleTotal(df: DataFrame, rows: Long, est: Long,
                     label: String): DataFrame = {
    val cap = capBytes(df)
    if (est <= cap && rows <= HardRowClamp) broadcast(df)
    else {
      // name the clamp that actually tripped (ADVICE r20): a row-clamp
      // refusal with a tiny byte estimate must not claim a byte overflow
      val reason =
        if (est > cap)
          s"estimated broadcast size ${est >> 20} MiB ($rows rows) " +
            s"exceeds the ${cap >> 20} MiB guard (driver-heap/10 " +
            "clamped under Spark's 8GB/512M-row broadcast limits; " +
            "spark.graft.forcedBroadcastMaxBytes overrides downward)"
        else
          s"$rows rows exceed the $HardRowClamp-row clamp (under " +
            s"Spark's 512M-row broadcast hard limit; est ${est >> 20} MiB)"
      System.err.println(s"[graft] $label: $reason — joining via shuffle " +
        "instead")
      df
    }
  }
}
