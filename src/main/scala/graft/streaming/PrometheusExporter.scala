package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Prometheus scrape endpoint over [[MetricsListener]] — the export half
  * of the monitoring stack the reference deploys (statsd-exporter →
  * Prometheus → Grafana; reference: `monitoring/prometheus/config/
  * prometheus.yml`, README "Monitoring"). The JVM-built-in HTTP server
  * keeps this dependency-free; rendering is the text exposition format
  * (version 0.0.4) every Prometheus-compatible scraper ingests.
  *
  * Per streaming query (the `query` label), cumulative since listener
  * attach — Prometheus counter semantics, `rate()` recovers per-batch
  * figures:
  *
  *   - `graft_stream_batches_total` — micro-batches executed
  *   - `graft_stream_input_rows_total` — rows ingested
  *   - `graft_stream_batch_duration_ms_total` — trigger wall-clock
  *   - `graft_stream_last_batch_id` — newest batch id (gauge; staleness
  *     and restart detection)
  *
  * Driver-side only by design: progress events land on the driver, and a
  * 1000-executor job still exposes ONE scrape target (executor-level
  * metrics belong to Spark's own metrics system, configured not coded).
  *
  * {{{
  * val listener = new MetricsListener
  * spark.streams.addListener(listener)
  * val exporter = PrometheusExporter.serve(listener, port = 9108)
  * // …Prometheus scrapes http://driver:9108/metrics…
  * exporter.stop()
  * }}}
  */
object PrometheusExporter {

  /** Render the listener's accumulated state as text exposition format.
    * Pure — spec'd directly, and usable with any other transport (push
    * gateway file, log line). */
  def render(metrics: Seq[MetricsListener.BatchMetric]): String = {
    val byQuery = metrics.groupBy(_.queryName).toSeq.sortBy(_._1)
    val sb = new StringBuilder
    def family(name: String, typ: String, help: String)(value: Seq[MetricsListener.BatchMetric] => Long): Unit = {
      sb ++= s"# HELP $name $help\n# TYPE $name $typ\n"
      byQuery.foreach { case (q, ms) =>
        sb ++= s"""$name{query="${escapeLabel(q)}"} ${value(ms)}\n"""
      }
    }
    family("graft_stream_batches_total", "counter",
      "Micro-batches executed since listener attach")(_.size.toLong)
    family("graft_stream_input_rows_total", "counter",
      "Input rows ingested since listener attach")(_.map(_.numInputRows).sum)
    family("graft_stream_batch_duration_ms_total", "counter",
      "Trigger execution wall-clock milliseconds since listener attach")(_.map(_.batchDurationMs).sum)
    family("graft_stream_last_batch_id", "gauge",
      "Newest batch id observed")(_.map(_.batchId).max)
    sb.result()
  }

  /** Label values escape `\`, `"`, and newline per the exposition spec. */
  private def escapeLabel(v: String): String =
    v.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case c => c.toString
    }

  /** A running scrape endpoint; `stop()` releases the port. */
  final class Endpoint private[PrometheusExporter] (server: HttpServer) {
    /** The bound port (useful when constructed with port 0). */
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Start serving `GET /metrics` for `listener` on `port` (0 = any free
    * port, see [[Endpoint.port]]). */
  def serve(listener: MetricsListener, port: Int): Endpoint = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = render(listener.metrics).getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
        x.sendResponseHeaders(200, body.length.toLong)
        try x.getResponseBody.write(body) finally x.close()
      }
    })
    server.start()
    new Endpoint(server)
  }
}
