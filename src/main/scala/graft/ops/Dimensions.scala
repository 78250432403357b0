package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history keeping — the warehouse
  * pattern for dimensions whose attributes change over time: every
  * change CLOSES the key's current row (`valid_to` = change time) and
  * appends a new current row (`valid_to` null). History is append-only
  * truth; any past state is recoverable with [[snapshotAt]].
  *
  * Scale posture: one key-keyed join pair (closed + untouched split) and
  * a union — no windows, no global sort; at 100 TB pair with
  * [[graft.pipeline.Pipeline.upsertPartitioned]]-style partition scoping
  * on a key-hash partition column if the dimension itself is huge
  * (dimensions usually aren't; facts are).
  */
object Dimensions {

  /** Apply one batch of `changes` (attribute rows + an event-time
    * column) to an SCD2 `history` (same attribute columns +
    * `valid_from`/`valid_to`). Multiple changes for one key within a
    * batch are collapsed to the LATEST by change time (the batch is one
    * transaction; intermediate flickers are not history). Changed keys'
    * current rows close at the change time; unknown keys simply insert.
    */
  def scd2Apply(history: DataFrame, changes: DataFrame,
                keyCols: Seq[String], tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val cur = history.filter(col("valid_to").isNull)
    val old = history.filter(col("valid_to").isNotNull)
    val chKeys = latest
      .select(keyCols.map(col) :+ col(tsCol).as("__chts"): _*)
    val closed = cur.drop("valid_to").join(chKeys, keyCols)
      .withColumn("valid_to", col("__chts")).drop("__chts")
    val untouched = cur.join(chKeys.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    val fresh = latest.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lit(null).cast(
        history.schema("valid_to").dataType))
      .drop(tsCol)
    old.unionByName(closed.select(old.columns.map(col): _*))
      .unionByName(untouched.select(old.columns.map(col): _*))
      .unionByName(fresh.select(old.columns.map(col): _*))
  }

  /** Time travel over an SCD2 history: the dimension exactly as it
    * stood at `at` — rows with `valid_from <= at < valid_to` (open
    * rows count as valid forever). A map-side filter; with the history
    * range-partitioned on `valid_from` this prunes too.
    */
  def snapshotAt(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
      .drop("valid_from", "valid_to")

  /** Bootstrap an SCD2 history from a current-state dimension: every
    * row valid from `from`, open-ended.
    */
  def scd2Init(current: DataFrame, from: Column): DataFrame =
    current.withColumn("valid_from", from)
      .withColumn("valid_to", lit(null).cast(
        current.select(from.as("__f")).schema("__f").dataType))

  /** [[scd2Apply]] for AT-LEAST-ONCE delivery (the CDC-stream face):
    * change rows whose time is not strictly after the key's current
    * `valid_from` are dropped first — a replayed batch re-delivers
    * changes the history already absorbed, and re-applying one would
    * close the current row AT ITS OWN `valid_from` and insert a
    * duplicate. With the guard, replay is a no-op BY CONSTRUCTION
    * (same contract as the ingest indexes: idempotent, not merely
    * usually-harmless). The guard is one key-keyed join against the
    * current rows (key-count-sized).
    */
  def scd2ApplyIdempotent(history: DataFrame, changes: DataFrame,
                          keyCols: Seq[String], tsCol: String): DataFrame = {
    val curFrom = history.filter(col("valid_to").isNull)
      .select(keyCols.map(col) :+ col("valid_from").as("__curf"): _*)
    val fresh = changes.join(curFrom, keyCols, "left")
      .filter(col("__curf").isNull || col(tsCol) > col("__curf"))
      .drop("__curf")
    scd2Apply(history, fresh, keyCols, tsCol)
  }

  /** Fact-to-SCD2 temporal join — every fact row enriched with the
    * dimension attributes that were valid AT THE FACT'S TIME (the
    * canonical warehouse query over versioned dimensions). This is
    * exactly a value-carrying as-of join on `valid_from`
    * ([[Joins.asofBackwardValues]]: one shuffle on the key, one
    * within-partition sort, NO range predicate ever reaching a join
    * operator — a naive `valid_from <= ts < valid_to` theta join plans
    * a nested loop), plus an expiry guard: a carried version whose
    * `valid_to` has passed (the key was closed with no successor)
    * null-extends instead of leaking stale attributes.
    *
    * Facts' time column and the history key must share names with the
    * dimension (`keyCol`, `tsCol` on the fact side).
    */
  def temporalJoin(facts: DataFrame, history: DataFrame, keyCol: String,
                   tsCol: String, attrCols: Seq[String],
                   prefix: String = "dim_"): DataFrame = {
    val hist = history.select(
      (col(keyCol) +: col("valid_from").as(tsCol) +:
        col("valid_to").as("__vto") +: attrCols.map(col)): _*)
    val joined = Joins.asofBackwardValues(facts, hist, keyCol, tsCol,
      "__vto" +: attrCols, prefix)
    val expired = col(s"${prefix}__vto").isNotNull &&
      col(s"${prefix}__vto") <= col(tsCol)
    attrCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"$prefix$c",
        when(expired, lit(null).cast(df.schema(s"$prefix$c").dataType))
          .otherwise(col(s"$prefix$c")))
    }.drop(s"${prefix}__vto", s"$prefix$tsCol")
  }
}
