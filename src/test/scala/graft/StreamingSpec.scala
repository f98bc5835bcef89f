package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling-window counts over a MemoryStream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.windowCounts(input.toDF, watermark = "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Complete).start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(15), 1, "click", 2.0),
        Event(3, ts(25), 2, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
      assert(rows.map(_.getAs[Long]("n")).sum == 3)
      assert(rows.forall(_.getAs[Timestamp]("window_start") == Timestamp.valueOf("2024-01-01 10:00:00")))
    } finally q.stop()
  }

  test("append-mode window agg emits only watermark-finalized windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.windowCounts(input.toDF, watermark = "10 minutes")
      .writeStream.format("memory").queryName("wcappend").outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      // watermark hasn't advanced past 10:00-11:00 yet → nothing finalized
      assert(spark.table("wcappend").count() == 0)
      // an event far in the future pushes the watermark beyond the window
      input.addData(Event(2, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wcappend").collect()
      assert(rows.length == 1 && rows(0).getAs[Long]("n") == 1)
      assert(rows(0).getAs[Timestamp]("window_start") == Timestamp.valueOf("2024-01-01 10:00:00"))
    } finally q.stop()
  }

  test("stateful aggregation runs on the RocksDB state store") {
    // the production state backend once streaming state outgrows the JVM
    // heap (billions of keys at fleet scale); ships with Spark, needs only
    // the provider conf — this proves the whole stateful path (windows +
    // watermark) is backend-portable
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = EventStream.windowCounts(input.toDF, watermark = "10 minutes")
        .writeStream.format("memory").queryName("rocks").outputMode(OutputMode.Complete).start()
      try {
        input.addData(Event(1, ts(5), 1, "click", 1.0), Event(2, ts(7), 2, "click", 2.0))
        q.processAllAvailable()
        input.addData(Event(3, ts(9), 1, "view", 3.0))
        q.processAllAvailable() // second batch reads back RocksDB state
        assert(spark.table("rocks").collect().map(_.getAs[Long]("n")).sum == 3)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("native session_window merges in-gap events, finalizes on watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionWindowCounts(
        input.toDF.withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("sw").outputMode(OutputMode.Append).start()
    try {
      // two events 5 min apart: one session (gap 30 min)
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("sw").count() == 0) // session still open
      // far-future event closes it via the watermark
      input.addData(Event(3, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sw").collect()
      assert(rows.length == 1 && rows(0).getAs[Long]("n_events") == 2)
      assert(rows(0).getAs[Timestamp]("session_start") == ts(0))
      // session_end = last event + gap
      assert(rows(0).getAs[Timestamp]("session_end") == Timestamp.valueOf("2024-01-01 10:35:00"))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.dedup(input.toDF)
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(1), 1, "click", 1.0),
        Event(1, ts(2), 1, "click", 1.0), // dup id
        Event(2, ts(3), 2, "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
    } finally q.stop()
  }

  test("stateful sessionization counts gap-separated sessions per user") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Update).start()
    try {
      input.addData(
        Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "click", 1.0), // same session
        Event(3, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "click", 1.0), // new session (gap > 30m)
        Event(4, Timestamp.valueOf("2024-01-01 10:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val byUser = spark.table("sess").collect()
        .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
      assert(byUser(1L) == (2L, 3L))
      assert(byUser(2L) == (1L, 1L))
    } finally q.stop()
  }

  test("metrics listener records per-batch progress") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val listener = new graft.streaming.MetricsListener
    spark.streams.addListener(listener)
    val input = MemoryStream[Event]
    val q = input.toDF.writeStream.format("memory").queryName("metered")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 1.0))
      q.processAllAvailable()
      // listener events arrive asynchronously on the listener bus
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      def metered = listener.metrics.filter(m => m.queryName == "metered" && m.numInputRows > 0)
      while (metered.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      assert(metered.map(_.numInputRows).sum == 2)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("checkpointed file stream restart resumes exactly-once (no reprocessing)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ckpt").toString
    val (srcDir, sinkDir, ckptDir) = (s"$root/src", s"$root/sink", s"$root/ckpt")
    new java.io.File(srcDir).mkdirs()
    def addBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, s"e$i")).toDF("id", "name")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, name STRING").parquet(srcDir)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckptDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    addBatch(0 until 10)
    runOnce()
    assert(spark.read.parquet(sinkDir).count() == 10)
    addBatch(10 until 15)
    runOnce() // restart from checkpoint: only the 5 new rows flow
    val out = spark.read.parquet(sinkDir)
    assert(out.count() == 15)
    assert(out.select("id").distinct().count() == 15) // no duplicates
  }

  test("stream-stream interval join matches purchases to recent same-user views") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.purchasesWithRecentViews(input.toDF)
      .writeStream.format("memory").queryName("ssj").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "view", 1.0),      // within 30m of purchase → match
        Event(2, ts(20), 1, "purchase", 5.0),
        Event(3, ts(1), 2, "view", 1.0),      // other user's view: no purchase
        Event(4, ts(25), 3, "purchase", 2.0)) // no prior view → dropped (inner)
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("purchase_id") == 2 && rows(0).getAs[Long]("view_id") == 1)
    } finally q.stop()
  }

  test("stream-static join enriches events with the batch user dimension") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = EventStream.enrichWithUserDim(input.toDF, dim)
      .writeStream.format("memory").queryName("ssenrich").outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 9, "click", 1.0))
      q.processAllAvailable()
      val byId = spark.table("ssenrich").collect()
        .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("tier"))).toMap
      assert(byId(1L).contains("gold") && byId(2L).isEmpty)
    } finally q.stop()
  }

  test("foreachBatch parquet sink accretes small files; compaction merges them") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("streamsink").toString + "/events"
    val input = MemoryStream[Event]
    val q = input.toDF.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.MedallionSink.write(batch, dir, Nil, org.apache.spark.sql.SaveMode.Append)
      }
      .start()
    try {
      (1 to 3).foreach { i =>
        input.addData(Event(i, ts(i), 1, "click", 1.0))
        q.processAllAvailable()
      }
      assert(spark.read.parquet(dir).count() == 3)
      val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
      assert(before >= 3) // one-plus file per micro-batch: the small-file problem
      graft.sources.MedallionSink.compact(spark, dir)
      val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
      assert(after < before && spark.read.parquet(dir).count() == 3)
    } finally q.stop()
  }

  test("state carries across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess2").outputMode(OutputMode.Update).start()
    try {
      input.addData(Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 7, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(2, Timestamp.valueOf("2024-01-01 13:00:00"), 7, "click", 1.0))
      q.processAllAvailable()
      val last = spark.table("sess2").collect()
        .filter(_.getAs[Long]("user_id") == 7L)
        .maxBy(_.getAs[Long]("n_events"))
      assert(last.getAs[Long]("n_sessions") == 2L && last.getAs[Long]("n_events") == 2L)
    } finally q.stop()
  }
}
