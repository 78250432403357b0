package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (plus the LLM-pipeline extensions); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible query, with column aliases
  * matching the Spark output exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full medallion silver chain (join + split + clean) over the
    * brewery-mapped fixtures.
    */
  def entry(spark: SparkSession): DataFrame =
    pipeline.Breweries.silver(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ LlmQueries.queries ++ AnalyticsQueries.queries ++
      ErQueries.queries ++ StatsQueries.queries ++ MiningQueries.queries

  def oracleSql: Map[String, String] =
    ParityQueries.oracle ++ LlmQueries.oracle ++ AnalyticsQueries.oracle ++
      ErQueries.oracle ++ StatsQueries.oracle ++ MiningQueries.oracle
}
