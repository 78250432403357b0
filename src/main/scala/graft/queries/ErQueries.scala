package graft.queries

import graft.Tables
import graft.ops.EntityResolution
import org.apache.spark.sql.functions.col

/** Entity-resolution / record-linkage queries: the exact edit-distance
  * similarity join ([[graft.ops.EntityResolution]]) exercised end-to-end
  * against brute-force DuckDB oracles.
  *
  * The fixture derives a DIVERSE name universe from `c_custkey` (reversed
  * zero-padded digits mapped to letters — reversing puts the uniform
  * low-order digit first, so segment blocks stay small; the raw
  * `Customer#00000NNNN` names share a constant prefix that floods one
  * segment bucket, the degenerate case the module doc and the cap spec
  * cover), then a deterministic dirty copy with one substitution,
  * deletion, or insertion keyed off the custkey — the classic
  * record-linkage shape with all three edit kinds, so cross-length
  * blocking is exercised, not just the Hamming case. Both the name
  * derivation and the mutation are SINGLE SQL fragments shared verbatim
  * between the Spark side (`selectExpr`) and the DuckDB oracle — there is
  * no way for the two engines to disagree about the fixture itself.
  */
object ErQueries {

  /** 6-char diverse name from the customer key (shared Spark/DuckDB SQL). */
  private val CleanNameSql =
    "translate(reverse(lpad(CAST(c_custkey AS VARCHAR(16)), 6, '0')), " +
      "'0123456789', 'abcdefghij')"

  /** One deterministic edit (sub/del/ins at position c_custkey % 6) for
    * 3/4 of records; `nm` must be the clean name column. 'z'/'q' are
    * outside the clean alphabet, so a mutated record is at distance
    * EXACTLY 1 from its source.
    */
  private val MutateSql =
    """CASE CAST(c_custkey % 4 AS INT)
      |  WHEN 1 THEN substr(nm, 1, CAST(c_custkey % 6 AS INT)) || 'z' ||
      |              substr(nm, CAST(c_custkey % 6 AS INT) + 2, 100)
      |  WHEN 2 THEN substr(nm, 1, CAST(c_custkey % 6 AS INT)) ||
      |              substr(nm, CAST(c_custkey % 6 AS INT) + 2, 100)
      |  WHEN 3 THEN substr(nm, 1, CAST(c_custkey % 6 AS INT)) || 'q' ||
      |              substr(nm, CAST(c_custkey % 6 AS INT) + 1, 100)
      |  ELSE nm END""".stripMargin

  /** Shared oracle CTEs: clean and dirty name relations. */
  private val FixtureCtes =
    s"""cl AS (SELECT c_custkey, $CleanNameSql AS nm FROM customer),
       |dr AS (SELECT c_custkey, $MutateSql AS nm FROM cl)""".stripMargin

  private def clean(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.customer(s, dir).selectExpr("c_custkey", s"$CleanNameSql AS nm")

  private def dirty(s: org.apache.spark.sql.SparkSession, dir: String) =
    clean(s, dir).selectExpr("c_custkey", s"$MutateSql AS nm")

  val queries: Map[String, Query] = Map(
    // unordered within-relation pairs at distance <= 1 over the clean
    // names — dedup-candidate discovery, the self-join face
    "er_self_pairs" -> ((s, dir) =>
      EntityResolution.editDistanceSelfJoin(clean(s, dir), "c_custkey", "nm",
          d = 1)
        .select(col("id_a"), col("id_b"), col("dist"))),

    // dirty->clean record linkage at distance <= 1: every candidate pair
    // (a dirty record can match several clean names — the mutation makes
    // it distance 1 from its OWN source and sometimes distance 1 from a
    // neighbor key's name too)
    "er_dirty_link" -> ((s, dir) =>
      EntityResolution.editDistanceJoin(
        dirty(s, dir).select(col("c_custkey").as("dirty_id"), col("nm")),
        "dirty_id", "nm",
        clean(s, dir).select(col("c_custkey").as("clean_id"), col("nm")),
        "clean_id", "nm", d = 1)),

    // resolution: each dirty record's single best match (min distance,
    // min clean id on ties) — one aggregation over the pair relation
    "er_link_best" -> ((s, dir) =>
      EntityResolution.linkBest(
        dirty(s, dir).select(col("c_custkey").as("dirty_id"), col("nm")),
        "dirty_id", "nm",
        clean(s, dir).select(col("c_custkey").as("clean_id"), col("nm")),
        "clean_id", "nm", d = 1))
  )

  val oracle: Map[String, String] = Map(
    "er_self_pairs" ->
      s"""WITH $FixtureCtes
         |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         |       CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
         |FROM cl a JOIN cl b ON a.c_custkey < b.c_custkey
         |WHERE levenshtein(a.nm, b.nm) <= 1""".stripMargin,

    "er_dirty_link" ->
      s"""WITH $FixtureCtes
         |SELECT d.c_custkey AS dirty_id, c.c_custkey AS clean_id,
         |       CAST(levenshtein(d.nm, c.nm) AS INT) AS dist
         |FROM dr d JOIN cl c ON levenshtein(d.nm, c.nm) <= 1""".stripMargin,

    "er_link_best" ->
      s"""WITH $FixtureCtes,
         |pr AS (SELECT d.c_custkey AS dirty_id, c.c_custkey AS clean_id,
         |              CAST(levenshtein(d.nm, c.nm) AS INT) AS dist
         |       FROM dr d JOIN cl c ON levenshtein(d.nm, c.nm) <= 1)
         |SELECT dirty_id, clean_id, dist FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY dirty_id ORDER BY dist, clean_id) AS rn FROM pr)
         |WHERE rn = 1""".stripMargin
  )
}
