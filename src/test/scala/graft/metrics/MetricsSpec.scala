package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {

  test("timed records success status and duration with reference names") {
    val m = EtlMetrics.quiet()
    val out = m.timed("extract_brewery_data") { 7 }
    assert(out == 7)
    assert(m.counter("brewery_etl_operations_total",
      Map("operation" -> "extract_brewery_data", "status" -> "success")) == 1.0)
    assert(m.durationCount("brewery_etl_processing_duration_seconds",
      Map("operation" -> "extract_brewery_data")) == 1)
  }

  test("timed records failure status and rethrows") {
    val m = EtlMetrics.quiet()
    intercept[RuntimeException](m.timed("op")(throw new RuntimeException("x")))
    assert(m.counter("brewery_etl_operations_total",
      Map("operation" -> "op", "status" -> "failure")) == 1.0)
    assert(m.counter("brewery_etl_operations_total",
      Map("operation" -> "op", "status" -> "success")) == 0.0)
  }

  test("counters accumulate, gauges overwrite, labels partition series") {
    val m = EtlMetrics.quiet()
    m.incCounter("c", Map("op" -> "a")); m.incCounter("c", Map("op" -> "a"), by = 3)
    m.incCounter("c", Map("op" -> "b"))
    assert(m.counter("c", Map("op" -> "a")) == 4.0)
    assert(m.counter("c", Map("op" -> "b")) == 1.0)
    m.setGauge("g", 5); m.setGauge("g", 9)
    assert(m.gauge("g") == 9.0)
    assert(m.recordsProcessed("x", 100L) == (()))
    assert(m.counter("brewery_etl_records_processed_total",
      Map("operation" -> "x")) == 100.0)
  }
}
