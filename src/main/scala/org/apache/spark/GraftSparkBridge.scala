package org.apache.spark

/** `private[spark]` access shims for graft (same pattern as
  * `org.apache.spark.sql.GraftSqlBridge`): the listener bus is internal
  * API, but deterministic metric collection needs its drain barrier —
  * a fixed sleep can undercount task metrics on a loaded bus.
  */
object GraftSparkBridge {
  /** Block until every queued listener event has been delivered. */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
