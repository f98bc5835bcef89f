package graft

import graft.sources.{IncrementalRefresh, ManifestTable}
import java.nio.file.Files

/** The incremental gold loop end-to-end: refreshes fold in only the new
  * rows, always land on exactly the full-recompute answer, replay as
  * no-ops, and see through source compaction. */
class IncrementalRefreshSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("incr").toString + "/t"

  private def batch(fromId: Long, n: Long) = {
    import org.apache.spark.sql.functions._
    spark.range(fromId, fromId + n).select(
      (col("id") % 5).cast("string").as("user_id"),
      (col("id") * 3).as("value"))
  }

  private def goldRows(root: String): Map[String, (Long, Long)] =
    ManifestTable.read(spark, root).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def recompute(root: String): Map[String, (Long, Long)] = {
    import org.apache.spark.sql.functions._
    ManifestTable.read(spark, root)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("refresh = full recompute after every source append; replay is a no-op") {
    val silver = freshRoot(); val gold = freshRoot()
    ManifestTable.append(spark, silver, batch(0, 100))
    val v1 = IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value")
    assert(v1.nonEmpty)
    assert(goldRows(gold) == recompute(silver))
    // replay: source unchanged → no new gold version, nothing staged
    assert(IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value").isEmpty)
    assert(ManifestTable.currentVersion(spark, gold) == v1)
    // second source batch folds in (new keys AND updated keys)
    ManifestTable.append(spark, silver, batch(100, 57))
    assert(IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value").nonEmpty)
    assert(goldRows(gold) == recompute(silver))
  }

  test("source compaction advances the mark without changing gold content") {
    val silver = freshRoot(); val gold = freshRoot()
    ManifestTable.append(spark, silver, batch(0, 80))
    ManifestTable.append(spark, silver, batch(80, 40))
    IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value")
    val before = goldRows(gold)
    ManifestTable.compact(spark, silver)
    // compaction-only delta: gold content identical, mark advanced so the
    // NEXT real append still diffs from the right version
    IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value")
    assert(goldRows(gold) == before)
    ManifestTable.append(spark, silver, batch(120, 30))
    IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value")
    assert(goldRows(gold) == recompute(silver))
  }

  test("refresh against an empty source is a no-op; first refresh needs no gold table") {
    val silver = freshRoot(); val gold = freshRoot()
    assert(IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value").isEmpty)
    assert(ManifestTable.currentVersion(spark, gold).isEmpty)
  }

  test("a source overwrite fails the refresh loud instead of double-counting gold") {
    val silver = freshRoot(); val gold = freshRoot()
    ManifestTable.append(spark, silver, batch(0, 60))
    IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value")
    val before = goldRows(gold)
    // re-run of already-folded data lands as an overwrite (row removal)
    ManifestTable.overwrite(spark, silver, batch(0, 60))
    val e = intercept[IllegalStateException] {
      IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value")
    }
    assert(e.getMessage.contains("removed"))
    assert(goldRows(gold) == before, "failed refresh must not have committed anything")
    // recovery: rebuild recomputes from the full snapshot, re-seeds the
    // mark, and the incremental loop resumes from there
    assert(IncrementalRefresh.rebuild(spark, silver, gold, Seq("user_id"), "value").nonEmpty)
    assert(goldRows(gold) == recompute(silver))
    ManifestTable.append(spark, silver, batch(200, 20))
    assert(IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value").nonEmpty)
    assert(goldRows(gold) == recompute(silver))
    // rebuild at an already-reflected version is a no-op
    assert(IncrementalRefresh.rebuild(spark, silver, gold, Seq("user_id"), "value").isEmpty)
  }

  test("trailing-slash source spelling shares the high-water mark (no silent re-fold)") {
    val silver = freshRoot(); val gold = freshRoot()
    ManifestTable.append(spark, silver, batch(0, 40))
    assert(IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value").nonEmpty)
    val before = goldRows(gold)
    assert(IncrementalRefresh.refreshAggregate(spark, silver + "/", gold, Seq("user_id"), "value").isEmpty)
    assert(goldRows(gold) == before)
  }

  test("decimal value column: the merge keeps a stable sum type across refreshes") {
    import org.apache.spark.sql.functions._
    val silver = freshRoot(); val gold = freshRoot()
    def decBatch(from: Long, n: Long) = spark.range(from, from + n).select(
      (col("id") % 3).cast("string").as("user_id"),
      (col("id") * 7).cast("decimal(10,2)").as("value"))
    ManifestTable.append(spark, silver, decBatch(0, 30))
    assert(IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value").nonEmpty)
    // the second refresh re-aggregates the committed decimal — an unpinned
    // sum type would widen precision and wedge on the schema-drift check
    ManifestTable.append(spark, silver, decBatch(30, 25))
    assert(IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value").nonEmpty)
    ManifestTable.append(spark, silver, decBatch(55, 5))
    assert(IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value").nonEmpty)
    val got = ManifestTable.read(spark, gold).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    val want = ManifestTable.read(spark, silver)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(got == want)
  }

  test("medallion live: stream → exactly-once silver → incremental gold, end to end") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val silver = freshRoot(); val gold = freshRoot()
    val input = MemoryStream[Long]
    // silver: micro-batches land via the exactly-once append; gold: the
    // CDF fold runs after each batch (the foreachBatch "refresh trigger")
    val q = input.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val rows = df.select(
          (col("value") % 3).cast("string").as("user_id"), (col("value") * 2).as("value"))
        ManifestTable.exactlyOnceAppend(spark, silver, rows, "medallion-stream", batchId)
        IncrementalRefresh.refreshAggregate(spark, silver, gold, Seq("user_id"), "value")
        ()
      }
      .start()
    try {
      input.addData(0L until 30L: _*)
      q.processAllAvailable()
      input.addData(30L until 47L: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(goldRows(gold) == recompute(silver))
    assert(goldRows(gold).values.map(_._1).sum == 47)
  }
}
