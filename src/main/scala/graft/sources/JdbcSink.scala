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
    * (table, writer, batchId) idempotent. `appId` identifies THIS
    * streaming query's lineage (use a stable name per query/checkpoint):
    * it keys both the ledger and the row tags, so independent queries
    * writing the same table can never skip or scrub each other's batches.
    * Protocol per batch:
    *   1. ledger hit for (table, appId, batchId) → the batch fully
    *      committed before a crash; skip.
    *   2. scrub rows tagged (appId, batchId) — a previous PARTIAL attempt,
    *   3. write the batch tagged with `writer_id` + `batch_id` columns,
    *   4. record (table, appId, batchId) in the `graft_commits` ledger.
    * A crash between 3 and 4 leaves untracked tagged rows that step 2
    * deletes on replay; a crash after 4 makes the replay a no-op — every
    * interleaving converges to each batch's rows appearing exactly once.
    * The ledger write is one tiny driver-side transaction; the bulk write
    * stays Spark's fan-out JDBC path capped at `numPartitions` connections.
    *
    * Table existence is probed through JDBC metadata (not vendor SQLState
    * codes), so the protocol is portable to the Postgres target the
    * reference writes to.
    */
  def exactlyOnceWriter(url: String, table: String, appId: String, user: String,
      password: String, numPartitions: Int = 8): (DataFrame, Long) => Unit = {
    (df, batchId) =>
      if (!withConn(url, user, password) { c => ensureLedger(c); isCommitted(c, table, appId, batchId) }) {
        withConn(url, user, password)(scrub(_, table, appId, batchId))
        write(df
            .withColumn("writer_id", org.apache.spark.sql.functions.lit(appId))
            .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId)),
          url, table, user, password, numPartitions)
        withConn(url, user, password)(markCommitted(_, table, appId, batchId))
      }
  }

  private val Ledger = "graft_commits"

  private def withConn[A](url: String, user: String, password: String)(
      f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url, user, password)
    try f(c) finally c.close()
  }

  /** Vendor-portable existence probe via connection metadata, scoped to
    * the table's schema when the name is qualified — a same-named table
    * in an unrelated schema must NOT count as existing (it would make
    * the first-batch scrub DELETE a nonexistent relation). BOTH the
    * schema and table name are matched case-insensitively by FILTERING
    * result rows, never by trusting the case-sensitive JDBC search
    * patterns: case-normalizing stores (Derby/Postgres fold unquoted
    * identifiers) would silently miss a pattern in the "wrong" case, skip
    * the scrub, and let a replayed partial batch leave duplicates.
    * The listing still narrows SERVER-SIDE where it can: both the schema
    * AND table-name patterns are probed as-written, upper- and
    * lower-folded, with one final unscoped TABLE listing (table-count
    * rows, never the column catalog) for stores whose normalization
    * matches none of the folds — so a warehouse with 10⁴ tables doesn't
    * stream its whole catalog per micro-batch, yet a fold-mismatch can't
    * cause a false negative. */
  private[graft] def tableExists(c: java.sql.Connection, table: String): Boolean = {
    val (schema, bare) = splitQualified(table)
    def scan(rs: java.sql.ResultSet): Boolean =
      try {
        var found = false
        while (!found && rs.next())
          found = rs.getString("TABLE_NAME").equalsIgnoreCase(bare) &&
            qualifierMatches(schema, rs.getString("TABLE_SCHEM"), catOf(rs))
        found
      } finally rs.close()
    val narrowed = for { sv <- probeVariants(schema); nv <- nameVariants(bare) } yield (sv, nv)
    narrowed.exists { case (sv, nv) => scan(c.getMetaData.getTables(null, sv, nv, Array("TABLE"))) } ||
      scan(c.getMetaData.getTables(null, null, null, Array("TABLE")))
  }

  /** Case-insensitive column-existence probe (same metadata rationale).
    * Always narrowed server-side by the table-name pattern folds — once
    * scoped to one table the listing is dozens of rows, so no unscoped
    * every-column-of-every-table backstop exists here. The residual risk
    * (a stored table name matching none of the three case folds) makes
    * this return false, and every caller fails LOUD on false (migration
    * errors), never silently skips a dedup scrub. */
  private[graft] def columnExists(c: java.sql.Connection, table: String, column: String): Boolean = {
    val (schema, bare) = splitQualified(table)
    val narrowed = for { sv <- probeVariants(schema); nv <- nameVariants(bare) } yield (sv, nv)
    narrowed.exists { case (sv, nv) =>
      val rs = c.getMetaData.getColumns(null, sv, nv, null)
      try {
        var found = false
        while (!found && rs.next())
          found = rs.getString("TABLE_NAME").equalsIgnoreCase(bare) &&
            qualifierMatches(schema, rs.getString("TABLE_SCHEM"), catOf(rs)) &&
            rs.getString("COLUMN_NAME").equalsIgnoreCase(column)
        found
      } finally rs.close()
    }
  }

  /** Case folds of an identifier for use as server-side JDBC search
    * patterns. `_` inside a name is a single-char wildcard to the
    * pattern matcher, so a pattern can only OVER-match — the client-side
    * equalsIgnoreCase filters above remain the correctness arbiter; the
    * pattern's only job is keeping the server from streaming its whole
    * catalog. */
  private def nameVariants(name: String): Seq[String] =
    Seq(name, name.toUpperCase, name.toLowerCase).distinct

  private def splitQualified(table: String): (String, String) = {
    val cut = table.lastIndexOf('.')
    if (cut < 0) (null, table) else (table.substring(0, cut), table.substring(cut + 1))
  }

  /** Server-side schema-pattern probes, cheapest-first: the literal
    * spelling, its upper/lower folds (Derby/Postgres normalization), then
    * unscoped as the correctness backstop (catalog-term vendors like
    * MySQL ignore the schema pattern entirely). Unqualified names go
    * straight to the unscoped listing. */
  private def probeVariants(schema: String): Seq[String] =
    if (schema == null) Seq(null)
    else (Seq(schema, schema.toUpperCase, schema.toLowerCase).distinct :+ null)

  /** A qualified name matches via TABLE_SCHEM, or — on vendors that
    * surface the namespace as a CATALOG and leave TABLE_SCHEM null
    * (MySQL/MariaDB) — via TABLE_CAT. Unqualified matches any namespace. */
  private def qualifierMatches(wanted: String, schem: String, cat: String): Boolean =
    wanted == null ||
      (schem != null && schem.equalsIgnoreCase(wanted)) ||
      (schem == null && cat != null && cat.equalsIgnoreCase(wanted))

  private def catOf(rs: java.sql.ResultSet): String =
    try rs.getString("TABLE_CAT") catch { case _: java.sql.SQLException => null }

  private def ensureLedger(c: java.sql.Connection): Unit =
    if (!tableExists(c, Ledger)) {
      try {
        c.createStatement().executeUpdate(
          s"""CREATE TABLE $Ledger (tbl VARCHAR(128) NOT NULL,
             | writer VARCHAR(128) NOT NULL, batch_id BIGINT NOT NULL,
             | committed_at TIMESTAMP NOT NULL,
             | PRIMARY KEY (tbl, writer, batch_id))""".stripMargin)
      } catch {
        // lost a create race to a concurrent writer: fine if it exists now
        case e: java.sql.SQLException => if (!tableExists(c, Ledger)) throw e
      }
    } else if (!columnExists(c, Ledger, "writer"))
      // fail FAST with the migration, not per-batch SQLExceptions: a ledger
      // from before writer-scoping can't safely dedup multi-writer batches
      throw new IllegalStateException(
        s"$Ledger predates writer-scoped commits; migrate with: " +
          s"ALTER TABLE $Ledger ADD COLUMN writer VARCHAR(128) NOT NULL DEFAULT 'legacy' " +
          "(and extend the primary key to (tbl, writer, batch_id))")

  private def isCommitted(c: java.sql.Connection, table: String, appId: String,
      batchId: Long): Boolean = {
    val ps = c.prepareStatement(
      s"SELECT 1 FROM $Ledger WHERE tbl = ? AND writer = ? AND batch_id = ?")
    ps.setString(1, table); ps.setString(2, appId); ps.setLong(3, batchId)
    ps.executeQuery().next()
  }

  private def scrub(c: java.sql.Connection, table: String, appId: String,
      batchId: Long): Unit =
    if (tableExists(c, table)) { // first batch: nothing to scrub
      if (!columnExists(c, table, "writer_id"))
        throw new IllegalStateException(
          s"$table exists without the writer_id tag column (pre-writer-scope data?); " +
            s"""migrate with: ALTER TABLE $table ADD COLUMN "writer_id" VARCHAR(128) DEFAULT 'legacy'""")
      // Spark's JDBC writer creates delimited (case-exact) column names, so
      // the tag columns must be referenced quoted — unquoted they would
      // normalize to the vendor's default case and miss. The VARCHAR cast
      // makes the comparison legal where StringType maps to CLOB/TEXT
      // (Derby CLOB has no '='); it is standard SQL and a no-op elsewhere.
      val ps = c.prepareStatement(
        s"""DELETE FROM $table WHERE CAST("writer_id" AS VARCHAR(128)) = ? AND "batch_id" = ?""")
      ps.setString(1, appId); ps.setLong(2, batchId)
      ps.executeUpdate()
    }

  private def markCommitted(c: java.sql.Connection, table: String, appId: String,
      batchId: Long): Unit = {
    val ps = c.prepareStatement(
      s"INSERT INTO $Ledger (tbl, writer, batch_id, committed_at) VALUES (?, ?, ?, CURRENT_TIMESTAMP)")
    ps.setString(1, table); ps.setString(2, appId); ps.setLong(3, batchId)
    ps.executeUpdate()
  }
}
