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
}
