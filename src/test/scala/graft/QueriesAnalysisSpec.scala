package graft

/** Analysis smoke over EVERY declared query: construct each
  * `SparkEntry.queries` plan against the sf0.001 fixtures and force
  * Catalyst analysis (`queryExecution.analyzed` — no job is run for
  * lazily-built plans). An AnalysisException in ANY declared query —
  * like round 12's `DATATYPE_MISMATCH` on the drifted events fixture —
  * must fail `sbt test` here, not surface for the first time at the
  * driver's bench.
  *
  * Some query closures do bounded eager work at construction (codebook
  * training, pipeline writes) at fixture scale; that cost is accepted —
  * it is exactly what the driver's Verify run pays per query.
  */
class QueriesAnalysisSpec extends SparkSpec {

  test("every declared query analyzes against the fixtures") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, sf0001).queryExecution.analyzed
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator.take(2).mkString(" "))
        } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries failed analysis:\n${failures.mkString("\n")}")
  }
}
