package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Round-8 regression: the testdata generator flipped `events.ts` from
  * parquet TIMESTAMP(NANOS) to TIMESTAMP(isAdjustedToUTC=0) (surfacing in
  * Spark as TIMESTAMP_NTZ), and every `unix_millis`/`unix_micros` call
  * site failed analysis — five oracle-green queries broke silently.
  * [[Tables.events]] now normalizes ANY writer flavor to session-TZ
  * TIMESTAMP at the loader. This spec pins that contract with a
  * purpose-written NTZ fixture so a future testdata flip (either
  * direction) fails here, not in the driver's correctness artifact. */
class NtzRegressionSpec extends SparkSpec {

  /** The five queries that broke in round 8 — all read only `events`. */
  private val regressed = Seq(
    "etl_upsert_latest", "etl_scd2_user_state",
    "q_asof_join", "q_sessionization_batch", "q_trailing_window")

  private lazy val ntzDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    // NTZ-flavored copy of the real sf0.001 events table (isAdjustedToUTC=0)
    Tables(spark, sf0001).events
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("loader normalizes TIMESTAMP_NTZ events.ts to session-TZ TIMESTAMP") {
    val ev = Tables(spark, ntzDir).events
    assert(ev.schema("ts").dataType == TimestampType)
    // value-identical under the UTC session TZ: same epoch micros as source
    val a = Tables(spark, sf0001).events.orderBy("event_id")
      .select(unix_micros(col("ts"))).limit(100).collect().map(_.getLong(0))
    val b = ev.orderBy("event_id")
      .select(unix_micros(col("ts"))).limit(100).collect().map(_.getLong(0))
    assert(a.sameElements(b))
  }

  test("the five round-8-regressed queries run green on an NTZ fixture") {
    val qs = SparkEntry.queries
    regressed.foreach { name =>
      val out = qs(name)(spark, ntzDir)
      assert(out.count() > 0, s"$name returned no rows on NTZ fixture")
    }
  }

  test("whichever flavor the current testdata carries, events loads as TIMESTAMP") {
    assert(Tables(spark, sf0001).events.schema("ts").dataType == TimestampType)
  }
}
