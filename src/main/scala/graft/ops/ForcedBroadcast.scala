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
  */
object ForcedBroadcast {

  /** The configurable cap (bytes). */
  def capBytes(df: DataFrame): Long =
    df.sparkSession.conf.getOption("spark.graft.forcedBroadcastMaxBytes")
      .map(_.toLong)
      .getOrElse(Runtime.getRuntime.maxMemory() / 10)

  /** `broadcast(df)` when `rows × rowBytes` fits the cap, else `df`
    * itself (the shuffle join is the right plan past broadcast size —
    * loud, never silent). `rowBytes` is the caller's estimate of one
    * hashed row on the driver: unsafe-row payload plus hash-table entry
    * overhead.
    */
  def orShuffle(df: DataFrame, rows: Long, rowBytes: Long,
                label: String): DataFrame = {
    val est = rows * rowBytes
    val cap = capBytes(df)
    if (est <= cap) broadcast(df)
    else {
      System.err.println(s"[graft] $label: estimated broadcast size " +
        s"${est >> 20} MiB ($rows rows x $rowBytes B) exceeds the " +
        s"${cap >> 20} MiB guard (a tenth of driver heap; " +
        "spark.graft.forcedBroadcastMaxBytes overrides) — joining via " +
        "shuffle instead")
      df
    }
  }
}
