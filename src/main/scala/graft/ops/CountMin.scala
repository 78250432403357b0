package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch — the fixed-size frequency-estimation summary
  * (Cormode & Muthukrishnan 2005). `depth` hash rows of `width` counters
  * each; a key's estimate is the MIN of its `depth` counters, which can
  * only OVER-count (collisions add, never subtract) — the one-sided
  * guarantee [[estimate]]'s audit face gates on.
  *
  * Complements [[HeavyHitters]] (Misra-Gries): MG answers "which keys
  * are frequent", CMS answers "how frequent is THIS key" for any key,
  * both in memory independent of the key cardinality.
  *
  * Scale posture: the build explodes `depth` (row, bucket) cells per
  * record, but partial aggregation collapses each partition to at most
  * `depth*width` cells before the shuffle — the exchanged volume is
  * sketch-sized per partition, never corpus-sized. Sketches merge by
  * plain counter addition (proved in CountMinSpec), so per-shard or
  * per-epoch partials roll up losslessly.
  *
  * Determinism: bucket hashes are md5 over an explicit `"row|key"`
  * string (the repo-wide convention, e.g. Dedup.scala:96) — a DuckDB
  * oracle rebuilds the IDENTICAL sketch in SQL.
  */
object CountMin {

  val DefaultWidth = 2048
  val DefaultDepth = 5

  /** Row-`i` bucket for `key`: first 8 md5 hex digits as a 32-bit int,
    * mod `width`.
    */
  def bucket(key: Column, row: Int, width: Int): Column =
    (conv(substring(md5(concat_ws("|", lit(row.toString),
      key.cast("string"))), 1, 8), 16, 10).cast("long") % width).cast("int")

  /** Build the sketch over `df(keyCol)` — one row per NON-EMPTY counter:
    * (row_i, bucket, cnt).
    */
  def build(df: DataFrame, keyCol: String,
      width: Int = DefaultWidth, depth: Int = DefaultDepth): DataFrame = {
    val cells = (0 until depth).map { i =>
      struct(lit(i).as("row_i"), bucket(col(keyCol), i, width).as("bucket"))
    }
    df.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.row_i").as("row_i"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query estimates for each distinct key in `keys(keyCol)`:
    * est = min over the key's `depth` counters (0 for a never-seen cell
    * — the left join keeps absent counters honest). The sketch side is
    * at most `depth*width` rows, so it broadcasts; the probe never
    * shuffles the key set.
    */
  def estimate(keys: DataFrame, keyCol: String, sketch: DataFrame,
      width: Int = DefaultWidth, depth: Int = DefaultDepth): DataFrame = {
    val cells = (0 until depth).map { i =>
      struct(lit(i).as("row_i"), bucket(col(keyCol), i, width).as("bucket"))
    }
    keys.select(col(keyCol), explode(array(cells: _*)).as("p"))
      .select(col(keyCol), col("p.row_i").as("row_i"),
        col("p.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row_i", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
