package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** Streaming progress collector — the engine-side seam for the monitoring
  * stack the reference deploys around its pipeline (statsd → Prometheus →
  * Grafana; reference: README.md "Monitoring"). Attach with
  * `spark.streams.addListener(new MetricsListener)`; each micro-batch
  * contributes (query, batchId, rows, duration) which an exporter can
  * scrape or a foreachBatch can persist.
  */
object MetricsListener {
  final case class BatchMetric(queryName: String, batchId: Long, numInputRows: Long,
      batchDurationMs: Long)
}

final class MetricsListener extends StreamingQueryListener {
  import MetricsListener.BatchMetric

  private val buf = ArrayBuffer.empty[BatchMetric]

  def metrics: Seq[BatchMetric] = buf.synchronized(buf.toSeq)

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    val m = BatchMetric(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
    buf.synchronized(buf += m)
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
