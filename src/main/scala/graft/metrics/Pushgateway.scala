package graft.metrics

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

/** Prometheus pushgateway client — the real network sink behind the
  * [[EtlMetrics]] facade, completing the reference's push path
  * (`utils/metrics.py:66-73`: `push_to_gateway(host, job, registry)`).
  *
  * Protocol (what prometheus_client does under the hood): an HTTP PUT
  * of the registry rendered in the text exposition format to
  * `http://<host>/metrics/job/<job>`. PUT (not POST) replaces the
  * job's whole grouping — the idempotent semantics a retried Airflow
  * task needs; a POST would merge with stale metrics from the failed
  * attempt.
  *
  * Rendering rules (text format v0.0.4):
  *  - one `# TYPE` line per family, then one sample line per label set;
  *  - counters/gauges verbatim; duration observations render as the
  *    summary pair `<name>_count` / `<name>_sum` (what the reference's
  *    Grafana rate() panels consume);
  *  - label values escape backslash, quote and newline; label sets
  *    render in sorted key order so the payload is deterministic
  *    (spec'd byte-for-byte).
  *
  * Driver-side ONLY, like every metrics call in this repo — a push
  * from inside an executor task would multiply the gateway's write
  * load by the task count and shred the job grouping.
  */
object Pushgateway {

  private def escape(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def labelStr(labels: Map[String, String]): String =
    if (labels.isEmpty) ""
    else labels.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""$k="${escape(v)}"""" }
      .mkString("{", ",", "}")

  /** Deterministic text exposition of a metrics snapshot. */
  def textExposition(counters: Seq[(String, Map[String, String], Double)],
      gauges: Seq[(String, Map[String, String], Double)],
      durations: Seq[(String, Map[String, String], Seq[Double])]): String = {
    val sb = new StringBuilder
    def family(kind: String,
        rows: Seq[(String, Map[String, String], Double)]): Unit =
      rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (name, rs) =>
        sb.append(s"# TYPE $name $kind\n")
        rs.sortBy(r => labelStr(r._2)).foreach { case (_, ls, v) =>
          sb.append(s"$name${labelStr(ls)} $v\n")
        }
      }
    family("counter", counters)
    family("gauge", gauges)
    durations.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (name, rs) =>
      sb.append(s"# TYPE $name summary\n")
      rs.sortBy(r => labelStr(r._2)).foreach { case (_, ls, obs) =>
        sb.append(s"${name}_count${labelStr(ls)} ${obs.size}\n")
        sb.append(s"${name}_sum${labelStr(ls)} ${obs.sum}\n")
      }
    }
    sb.toString
  }

  /** Encode one URL path segment. URLEncoder is form-encoding: it maps
    * ' ' to '+', which a pushgateway decodes as a literal plus and
    * silently re-targets the job grouping — so '+' is rewritten to the
    * path escape %20. '/' cannot be percent-escaped in this position
    * either (gateways split the raw path first); the pushgateway's own
    * convention for slash-bearing values is the base64 segment form
    * `job@base64/<urlsafe-b64>`, which we emit whenever the name
    * contains '/'.
    */
  private[metrics] def pathSegment(job: String): String =
    if (job.contains("/"))
      java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(job.getBytes(StandardCharsets.UTF_8))
    else
      URLEncoder.encode(job, StandardCharsets.UTF_8).replace("+", "%20")

  /** Full job path fragment: plain segment, or the @base64 form for
    * names containing '/'.
    */
  private[metrics] def jobPath(job: String): String =
    if (job.contains("/")) "job@base64/" + pathSegment(job)
    else "job/" + pathSegment(job)

  /** PUT the payload for `job` to the gateway at `host` (host:port, no
    * scheme). Returns true on 2xx; false (with a stderr line) on any
    * failure — the reference's push_metrics contract: observability
    * must never take down the pipeline.
    */
  def push(host: String, job: String, body: String,
      timeoutMs: Int = 5000): Boolean =
    try {
      val url = new URI(s"http://$host/metrics/" + jobPath(job)).toURL
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("PUT")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      conn.setFixedLengthStreamingMode(bytes.length)
      val os = conn.getOutputStream
      try os.write(bytes) finally os.close()
      val code = conn.getResponseCode
      conn.disconnect()
      if (code / 100 == 2) true
      else {
        System.err.println(s"[metrics] pushgateway returned HTTP $code")
        false
      }
    } catch { case e: Exception =>
      System.err.println(s"[metrics] failed to push to $host: $e")
      false
    }
}
