package graft.streaming

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — the reference's Kafka → Spark
  * Structured Streaming → Delta path (reference:
  * pipeline/data_ingestion/spark_structured_datastream.py:56-79)
  * re-expressed over Spark's streaming engine. This environment has no
  * Kafka broker or connector jar, so sources are files/MemoryStream; the
  * transformations are source-agnostic DataFrame → DataFrame functions, so
  * swapping in `readStream.format("kafka")` on a cluster changes one line.
  *
  * Scale: watermarks bound all state; windowed aggregation state is keyed
  * by (window, type) — constant size; sessionization state is per-user and
  * evicted on event-time timeout. Watermark semantics follow Spark's
  * bounded-lateness model (cf. "Watermarks in Stream Processing Systems:
  * Semantics and Comparative Analysis of Apache Flink and Google Cloud
  * Dataflow", VLDB 2021 — Spark's conservative min-across-partitions
  * watermark is what makes the append-mode finalization in
  * [[windowCounts]] deterministic).
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)
  // public: the state encoder's generated code must access the members
  final case class SessState(lastMs: Long, nSessions: Long, nEvents: Long)

  /** Watermarked tumbling-window counts — the streaming aggregation. */
  def windowCounts(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming dedup on event_id within the watermark horizon. */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Stateful gap-based sessionization via flatMapGroupsWithState:
    * per-user state carries the last-event time; a >30 min gap opens a new
    * session. Emits a running summary per user on every update. State is
    * evicted on EVENT-TIME timeout once the watermark passes the session
    * gap — without it, one state entry per ever-seen user accumulates
    * forever on an unbounded user space. */
  def sessionize(events: Dataset[Event], gapMs: Long = 1800000L,
      watermark: String = "1 hour"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionSummary](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            state.remove() // session closed by watermark: free the state
            Iterator.empty
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var s = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
            sorted.foreach { e =>
              val newSession = s.lastMs == Long.MinValue || e.ts.getTime - s.lastMs > gapMs
              s = SessState(e.ts.getTime, s.nSessions + (if (newSession) 1 else 0), s.nEvents + 1)
            }
            state.update(s)
            // evict when the watermark passes the gap after the last event
            // (timeouts must sit above the current watermark)
            state.setTimeoutTimestamp(
              math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            Iterator(SessionSummary(uid, s.nSessions, s.nEvents))
          }
      }
  }

  /** Stream-stream interval join: each purchase joined to same-user view
    * events from the preceding 30 minutes. Watermarks on both sides bound
    * the join state (Spark evicts buffered rows past the watermark +
    * interval), which is what keeps a day-long run at fleet scale from
    * accumulating unbounded state. */
  def purchasesWithRecentViews(events: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    purchases.join(
      views,
      expr("""user_id = v_user_id AND
              view_ts <= purchase_ts AND
              view_ts >= purchase_ts - INTERVAL 30 MINUTES"""))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"), col("view_id"), col("view_ts"))
  }

  /** Stream-static enrichment: streaming events joined to a static user
    * dimension. No broadcast hint: the user dimension grows with the
    * corpus, so forcing a broadcast would OOM the driver at fleet scale.
    * When the static side's stats fit under
    * `spark.sql.autoBroadcastJoinThreshold` Spark broadcasts it anyway;
    * when they don't, the planner falls back to a shuffled join — the
    * only plan that works at 100 TB. */
  def enrichWithUserDim(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(userDim, Seq("user_id"), "left")

  /** Deterministic synthetic event stream — the reference's fake-data
    * Kafka producer (reference: pipeline/data_ingestion/kafka_producer/
    * produce_fake_data.py) without the broker: the rate-micro-batch
    * source emits `rowsPerBatch` rows per micro-batch and every derived
    * field is a pure function of the monotonically increasing `value`,
    * so runs are reproducible. */
  def fakeEvents(spark: org.apache.spark.sql.SparkSession, rowsPerBatch: Int = 100,
      users: Int = 150, advanceMsPerBatch: Long = 1000L): DataFrame = {
    val types = array(Seq("click", "view", "purchase", "signup", "error").map(lit): _*)
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("advanceMillisPerBatch", advanceMsPerBatch)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(users)).as("user_id"),
        element_at(types, (pmod(col("value"), lit(5)) + 1).cast("int")).as("event_type"),
        round(pmod(col("value") * 7919L, lit(10000)) / 100.0, 2).as("value"))
  }

  /** Native gap-based session windows (`session_window`) — the built-in
    * alternative to [[sessionize]]'s custom state for plain per-session
    * aggregates: merging window state, watermark eviction, no user state
    * machine. Works identically over batch and stream frames. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Driver-verifiable batch face of [[sessionWindowCounts]]: the oracle
    * states sessions the classic gaps-and-islands way (lag + running sum
    * of gap breaks), so the green row PROVES Spark's native session
    * operator implements those SQL semantics (session_end = last event +
    * gap). */
  def sessionWindowCountsBatch(t: Tables): DataFrame =
    sessionWindowCounts(t.events).orderBy("user_id", "session_start")

  private val sessionWindowCountsBatchSql =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 OR
      |              lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events
      |FROM sessions GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Batch-equivalent of [[windowCounts]] (same tumbling semantics) — the
    * driver-verifiable face of the streaming aggregation. */
  def windowCountsBatch(t: Tables): DataFrame =
    windowCounts(t.events)
      .orderBy("window_start", "event_type")

  private val windowCountsBatchSql =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n, round(sum(value),4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Driver-verifiable batch face of [[purchasesWithRecentViews]] — the
    * SAME code path over the batch frame (withWatermark is a no-op in
    * batch execution), so the green row proves the interval-join
    * predicate's semantics; the streaming run differs only in state
    * eviction, which StreamingSpec covers. */
  def intervalJoinBatch(t: Tables): DataFrame =
    purchasesWithRecentViews(t.events)
      .orderBy("purchase_id", "view_id")

  private val intervalJoinBatchSql =
    """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |       v.event_id AS view_id, v.ts AS view_ts
      |FROM events p JOIN events v
      |  ON v.user_id = p.user_id AND p.event_type = 'purchase' AND v.event_type = 'view'
      | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
      |ORDER BY purchase_id, view_id""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("stream_window_counts", windowCountsBatch, Some(windowCountsBatchSql)),
    QueryDef("stream_session_counts", sessionWindowCountsBatch, Some(sessionWindowCountsBatchSql)),
    QueryDef("stream_interval_join", intervalJoinBatch, Some(intervalJoinBatchSql))
  )
}
