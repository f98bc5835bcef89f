package graft

import graft.sources.{GhArchiveSource, JdbcSink}
import org.apache.spark.sql.SaveMode

/** Round-trips the gold-layer JDBC write through embedded Derby (on the
  * Spark unmanaged classpath) — the reference's `write_tables_in_gold`
  * step against a real database engine, not just compilation. */
class JdbcSinkSpec extends SparkSpec {

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  test("gold dims write + read back through JDBC (users/orgs, reference gold step)") {
    val silver = GhArchiveSource.synthetic(spark, 1000L)
    val users = GhArchiveSource.users(silver)
    val orgs = GhArchiveSource.organizations(silver)
    JdbcSink.write(users, url("gold1"), "users", "app", "app", numPartitions = 4)
    JdbcSink.write(orgs, url("gold1"), "organizations", "app", "app", numPartitions = 4)
    val usersBack = spark.read.format("jdbc")
      .option("url", url("gold1")).option("dbtable", "users")
      .option("user", "app").option("password", "app").load()
    assert(usersBack.count() == users.count())
    import org.apache.spark.sql.functions.col
    val expect = users.select(col("id"), col("login")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = usersBack.select(col("id"), col("login")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expect)
    assert(spark.read.format("jdbc")
      .option("url", url("gold1")).option("dbtable", "organizations")
      .option("user", "app").option("password", "app").load().count() == orgs.count())
  }

  test("append mode accretes rows; connection fan-out capped by numPartitions") {
    val df = spark.range(100).toDF("id")
    JdbcSink.write(df, url("gold2"), "t", "app", "app", numPartitions = 2)
    JdbcSink.write(df, url("gold2"), "t", "app", "app", numPartitions = 2, mode = SaveMode.Append)
    val back = spark.read.format("jdbc")
      .option("url", url("gold2")).option("dbtable", "t")
      .option("user", "app").option("password", "app").load()
    assert(back.count() == 200)
    // the write plan's final stage width is the connection cap
    assert(df.repartition(2).rdd.getNumPartitions == 2)
  }

  private def readBack(db: String, table: String) = spark.read.format("jdbc")
    .option("url", url(db)).option("dbtable", table)
    .option("user", "app").option("password", "app").load()

  test("exactly-once writer: replay of a committed batch is a no-op") {
    import spark.implicits._
    val w = JdbcSink.exactlyOnceWriter(url("eo1"), "gold", "qA", "app", "app", numPartitions = 2)
    val batch = Seq((1L, "click"), (2L, "view")).toDF("id", "event_type")
    w(batch, 0L)
    w(batch, 0L) // checkpoint replay after a crash that happened post-commit
    assert(readBack("eo1", "gold").count() == 2)
  }

  test("exactly-once writer: partial attempt is scrubbed on replay") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val w = JdbcSink.exactlyOnceWriter(url("eo2"), "gold", "qA", "app", "app", numPartitions = 2)
    w(Seq((1L, "a")).toDF("id", "v"), 0L)
    // crash between the bulk write and the ledger commit of batch 1:
    // tagged rows landed, ledger has no record of them
    JdbcSink.write(Seq((2L, "b")).toDF("id", "v")
        .withColumn("writer_id", lit("qA")).withColumn("batch_id", lit(1L)),
      url("eo2"), "gold", "app", "app", numPartitions = 2)
    w(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), 1L) // replay redelivers the full batch
    val got = readBack("eo2", "gold").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSeq.sorted
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"))) // each row exactly once
  }

  test("exactly-once writer: independent writers on one table don't collide") {
    import spark.implicits._
    val wA = JdbcSink.exactlyOnceWriter(url("eo4"), "gold", "qA", "app", "app", 2)
    val wB = JdbcSink.exactlyOnceWriter(url("eo4"), "gold", "qB", "app", "app", 2)
    wA(Seq((1L, "a")).toDF("id", "v"), 5L)
    // B's batch 5 is a DIFFERENT stream: must neither be skipped by A's
    // ledger row nor scrub A's committed rows
    wB(Seq((2L, "b")).toDF("id", "v"), 5L)
    val got = readBack("eo4", "gold").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSeq.sorted
    assert(got == Seq((1L, "a"), (2L, "b")))
  }

  test("metadata probes match schema qualifiers case-insensitively (Derby folds to upper)") {
    val c = java.sql.DriverManager.getConnection(url("meta1"), "app", "app")
    try {
      c.createStatement().executeUpdate("CREATE TABLE probe_t (x INT)") // lands in schema APP
      for (t <- Seq("probe_t", "app.probe_t", "APP.PROBE_T", "App.Probe_T"))
        assert(JdbcSink.tableExists(c, t), s"tableExists($t)")
      assert(!JdbcSink.tableExists(c, "other.probe_t"), "wrong schema must not count")
      assert(!JdbcSink.tableExists(c, "app.absent_t"))
      assert(JdbcSink.columnExists(c, "app.probe_t", "x"))
      assert(JdbcSink.columnExists(c, "app.probe_t", "X"))
      assert(!JdbcSink.columnExists(c, "app.probe_t", "y"))
      assert(!JdbcSink.columnExists(c, "other.probe_t", "x"))
    } finally c.close()
  }

  test("exactly-once writer scrubs partial batches on a schema-qualified table") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    // lowercase qualifier vs Derby's folded APP: a case-sensitive probe would
    // miss the table, skip the scrub, and duplicate row 2 on replay
    val w = JdbcSink.exactlyOnceWriter(url("eo5"), "app.gold_q", "qA", "app", "app", 2)
    w(Seq((1L, "a")).toDF("id", "v"), 0L)
    JdbcSink.write(Seq((2L, "b")).toDF("id", "v")
        .withColumn("writer_id", lit("qA")).withColumn("batch_id", lit(1L)),
      url("eo5"), "app.gold_q", "app", "app", numPartitions = 2)
    w(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), 1L)
    val got = readBack("eo5", "app.gold_q").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSeq.sorted
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("exactly-once writer drives a streaming foreachBatch end-to-end") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[Long]
    val q = input.toDF().writeStream
      .foreachBatch(JdbcSink.exactlyOnceWriter(url("eo3"), "stream_gold", "q1", "app", "app", 2))
      .start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L)
      q.processAllAvailable()
    } finally q.stop()
    assert(readBack("eo3", "stream_gold").count() == 4)
  }
}
