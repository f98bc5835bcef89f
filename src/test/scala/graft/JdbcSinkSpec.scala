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
}
