package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (the silver partition key
  * `location` is country-dominant-skewed — SURVEY §7 step 8; at 100 TB a
  * single hot key would pin one reducer).
  *
  * AQE's skew-join split handles most cases at runtime; these helpers are
  * the explicit fallback when AQE can't (first aggregation over a
  * pathological key, or a shuffle join where one key exceeds a single
  * task's memory). Salts are DETERMINISTIC (hash-derived, no rand()), so
  * results are reproducible and oracle-checkable.
  */
object Skew {

  /** Two-phase salted aggregation: count rows per key tuple by first
    * aggregating on (keys, salt) — spreading a hot key over `salts`
    * reducers — then re-aggregating on the keys alone. Identical output to
    * [[Aggregations.groupCount]]; the salt comes from hashing `entropyCol`
    * (any high-cardinality column).
    */
  def saltedGroupCount(df: DataFrame, keys: Seq[String], entropyCol: String,
                       salts: Int, countName: String = "count"): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(entropyCol)), lit(salts)))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(countName))
  }

  /** Salted equi-join of a skewed big side against a small-but-too-big-to-
    * broadcast side: the big side derives a deterministic salt from
    * `entropyCol`; the small side is replicated `salts` times so every
    * (key, salt) bucket finds its match. Output equals the plain join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 entropyCol: String, salts: Int): DataFrame = {
    val b = big.withColumn("__salt", pmod(hash(col(entropyCol)), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
