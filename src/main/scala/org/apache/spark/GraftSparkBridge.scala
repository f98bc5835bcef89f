package org.apache.spark

/** `private[spark]` access shims for graft (same pattern as
  * `org.apache.spark.sql.GraftSqlBridge`): the listener bus is internal
  * API, but deterministic metric collection needs its drain barrier —
  * a fixed sleep can undercount task metrics on a loaded bus.
  */
object GraftSparkBridge {
  /** Block until every queued listener event has been delivered. A bus
    * still busy after the timeout logs a warning instead of aborting the
    * caller — stale-by-a-little metrics beat losing a whole probe run. */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long = 60000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println(
          s"WARN: listener bus still draining after ${timeoutMs}ms — metrics may undercount")
    }
}
