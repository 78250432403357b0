package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Executor-side I/O accounting via a `SparkListener`: sums task input
  * bytes/records while a body runs and records them under the reference's
  * metric names. Complements the deterministic dir-size gauge with what
  * the cluster actually read (post column-pruning / pushdown — on a scan
  * that prunes to 2 of 40 columns these numbers are the proof).
  *
  * Listener events are delivered asynchronously; totals are read after a
  * bounded drain wait, so they are accurate at stage granularity (the
  * reference's granularity) though not transactional per-task.
  */
object SparkIoMetrics {

  def measure[T](spark: SparkSession, metrics: EtlMetrics,
                 operation: String)(body: => T): T = {
    val bytes = new AtomicLong()
    val records = new AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.inputMetrics.bytesRead)
          records.addAndGet(m.inputMetrics.recordsRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try body
    finally {
      // bounded drain: listener delivery is async
      val deadline = System.nanoTime() + 2000000000L
      var last = -1L
      while (System.nanoTime() < deadline &&
        (bytes.get() != last || last == -1L)) {
        last = bytes.get()
        Thread.sleep(50)
      }
      spark.sparkContext.removeSparkListener(listener)
      metrics.bytesProcessed(s"${operation}_input", bytes.get())
      metrics.incCounter("brewery_etl_records_processed_total",
        Map("operation" -> s"${operation}_input"), records.get().toDouble)
    }
  }
}
