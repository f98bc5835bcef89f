package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC gold-layer writer — the reference's `write_tables_in_gold` step
  * (reference: pipeline/airflow/dags/load_data_task.py:193-236) as a
  * reusable sink. Round-tripped in JdbcSinkSpec against embedded Derby
  * (the one JDBC engine on the Spark classpath here); wire it to a real
  * warehouse with the same four calls the reference makes
  * (users/repos/events/organizations).
  *
  * Scale notes: `numPartitions` caps concurrent connections (a 1000-task
  * write would otherwise DDoS the database); batch inserts are on by
  * default in Spark's JDBC writer (`batchsize`, default 1000);
  * `isolationLevel=NONE` matches the reference's bulk-load setting.
  */
object JdbcSink {
  def write(df: DataFrame, url: String, table: String, user: String,
      password: String, numPartitions: Int = 8,
      mode: SaveMode = SaveMode.Append): Unit =
    // repartition, not coalesce: coalesce would collapse the UPSTREAM
    // computation to numPartitions tasks; the shuffle barrier caps only
    // the concurrent JDBC connections
    df.repartition(numPartitions)
      .write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("isolationLevel", "NONE")
      .mode(mode)
      .save()

  // ---- exactly-once streaming sink --------------------------------------

  /** Exactly-once `foreachBatch` writer for Structured Streaming → JDBC.
    *
    * The checkpoint gives at-least-once micro-batch delivery, and a replay
    * carries the SAME batchId — so exactly-once reduces to making each
    * (table, batchId) idempotent. Protocol per batch:
    *   1. ledger hit for (table, batchId) → the batch fully committed
    *      before a crash; skip.
    *   2. scrub rows tagged with this batchId (a previous PARTIAL attempt),
    *   3. write the batch tagged with `batch_id`,
    *   4. record (table, batchId) in the `graft_commits` ledger.
    * A crash between 3 and 4 leaves untracked tagged rows that step 2
    * deletes on replay; a crash after 4 makes the replay a no-op — every
    * interleaving converges to each batch's rows appearing exactly once.
    * The ledger write is one tiny driver-side transaction; the bulk write
    * stays Spark's fan-out JDBC path capped at `numPartitions` connections.
    */
  def exactlyOnceWriter(url: String, table: String, user: String,
      password: String, numPartitions: Int = 8): (DataFrame, Long) => Unit = {
    (df, batchId) =>
      if (!withConn(url, user, password) { c => ensureLedger(c); isCommitted(c, table, batchId) }) {
        withConn(url, user, password)(scrub(_, table, batchId))
        write(df.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId)),
          url, table, user, password, numPartitions)
        withConn(url, user, password)(markCommitted(_, table, batchId))
      }
  }

  private val Ledger = "graft_commits"

  private def withConn[A](url: String, user: String, password: String)(
      f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url, user, password)
    try f(c) finally c.close()
  }

  private def ensureLedger(c: java.sql.Connection): Unit =
    try {
      c.createStatement().executeUpdate(
        s"""CREATE TABLE $Ledger (tbl VARCHAR(128) NOT NULL,
           | batch_id BIGINT NOT NULL, committed_at TIMESTAMP NOT NULL,
           | PRIMARY KEY (tbl, batch_id))""".stripMargin)
    } catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () } // exists

  private def isCommitted(c: java.sql.Connection, table: String, batchId: Long): Boolean = {
    val ps = c.prepareStatement(s"SELECT 1 FROM $Ledger WHERE tbl = ? AND batch_id = ?")
    ps.setString(1, table); ps.setLong(2, batchId)
    ps.executeQuery().next()
  }

  private def scrub(c: java.sql.Connection, table: String, batchId: Long): Unit =
    try {
      // Spark's JDBC writer creates delimited (case-exact) column names, so
      // the tag column must be referenced quoted — unquoted it would
      // normalize to BATCH_ID and miss
      val ps = c.prepareStatement(s"""DELETE FROM $table WHERE "batch_id" = ?""")
      ps.setLong(1, batchId)
      ps.executeUpdate()
    } catch { case e: java.sql.SQLException if e.getSQLState == "42X05" => () } // first batch: no table yet

  private def markCommitted(c: java.sql.Connection, table: String, batchId: Long): Unit = {
    val ps = c.prepareStatement(
      s"INSERT INTO $Ledger (tbl, batch_id, committed_at) VALUES (?, ?, CURRENT_TIMESTAMP)")
    ps.setString(1, table); ps.setLong(2, batchId)
    ps.executeUpdate()
  }
}
