package graft.metrics

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Metric-name-compatible observability facade (reference
  * utils/metrics.py:8-126): the reference pushes `brewery_etl_*` counters,
  * gauges and duration histograms to a Prometheus pushgateway; its Grafana
  * dashboards key on those names. This facade keeps the names and label
  * shapes so the dashboards keep working; the backend here is an
  * in-memory registry + log lines (swap `sink` for a pushgateway client in
  * production — driver-side only, never inside executors).
  */
final class EtlMetrics(sink: String => Unit = s => System.err.println(s"[metrics] $s")) {

  private val counters = new ConcurrentHashMap[(String, Map[String, String]), Double]()
  private val gauges = new ConcurrentHashMap[(String, Map[String, String]), Double]()
  private val durations = new ConcurrentHashMap[(String, Map[String, String]), Vector[Double]]()

  def incCounter(name: String, labels: Map[String, String] = Map.empty,
                 by: Double = 1.0): Unit = {
    counters.merge((name, labels), by, (a, b) => a + b)
    sink(s"counter $name$labels += $by")
  }

  def setGauge(name: String, value: Double,
               labels: Map[String, String] = Map.empty): Unit = {
    gauges.put((name, labels), value)
    sink(s"gauge $name$labels = $value")
  }

  def observeDuration(name: String, seconds: Double,
                      labels: Map[String, String] = Map.empty): Unit = {
    durations.merge((name, labels), Vector(seconds), (a, b) => a ++ b)
    sink(s"duration $name$labels = $seconds s")
  }

  def counter(name: String, labels: Map[String, String] = Map.empty): Double =
    counters.getOrDefault((name, labels), 0.0)

  def gauge(name: String, labels: Map[String, String] = Map.empty): Double =
    gauges.getOrDefault((name, labels), 0.0)

  def durationCount(name: String, labels: Map[String, String] = Map.empty): Int =
    durations.getOrDefault((name, labels), Vector.empty).size

  /** Context-manager equivalent of the reference's ETLMetricsContext
    * (metrics.py:95-126): wraps an operation, records
    * `brewery_etl_operations_total{operation,status}` and
    * `brewery_etl_processing_duration_seconds{operation}`, rethrows on
    * failure.
    */
  def timed[T](operation: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try {
      val out = body
      incCounter("brewery_etl_operations_total",
        Map("operation" -> operation, "status" -> "success"))
      out
    } catch {
      case e: Throwable =>
        incCounter("brewery_etl_operations_total",
          Map("operation" -> operation, "status" -> "failure"))
        throw e
    } finally {
      observeDuration("brewery_etl_processing_duration_seconds",
        (System.nanoTime() - t0) / 1e9, Map("operation" -> operation))
    }
  }

  def recordsProcessed(operation: String, n: Long): Unit =
    incCounter("brewery_etl_records_processed_total",
      Map("operation" -> operation), n.toDouble)

  def bytesProcessed(operation: String, n: Long): Unit =
    incCounter("brewery_etl_data_processed_bytes",
      Map("operation" -> operation), n.toDouble)

  def snapshot(): Map[String, Double] =
    counters.asScala.map { case ((n, l), v) => s"$n$l" -> v }.toMap ++
      gauges.asScala.map { case ((n, l), v) => s"$n$l" -> v }.toMap

  /** The registry rendered in the Prometheus text exposition format —
    * deterministic (sorted families and label sets), spec'd
    * byte-for-byte in MetricsSpec.
    */
  def textExposition(): String = Pushgateway.textExposition(
    counters.asScala.toSeq.map { case ((n, l), v) => (n, l, v) },
    gauges.asScala.toSeq.map { case ((n, l), v) => (n, l, v) },
    durations.asScala.toSeq.map { case ((n, l), v) => (n, l, v) })

  /** Push the registry to a pushgateway — the reference's
    * `push_metrics(job)` (metrics.py:66-73), real network client
    * included ([[Pushgateway]]). Returns false rather than throwing:
    * observability must never take down the pipeline.
    */
  def pushTo(host: String, job: String): Boolean =
    Pushgateway.push(host, job, textExposition())
}

object EtlMetrics {
  /** A silent registry (tests / benchmark runs). */
  def quiet(): EtlMetrics = new EtlMetrics(_ => ())
}
