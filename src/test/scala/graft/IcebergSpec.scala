package graft

import graft.sources.{IcebergTable, IcebergWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Iceberg read support against [[IcebergWriter]] — an INDEPENDENT
  * writer of the public table spec (metadata JSON + Avro manifests), so
  * these cases pin the FORMAT, not a round-trip through the reader's
  * own code. */
class IcebergSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("iceberg").toString + "/t"

  private def docs(lo: Int, hi: Int): DataFrame = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"name_$i", i * 10.0)).toDF("id", "name", "score")
  }

  test("basic read: current snapshot serves all live files") {
    val root = freshRoot()
    IcebergWriter.create(spark, root, Seq(docs(0, 50), docs(50, 100)))
    val got = IcebergTable.read(spark, root)
    assert(got.count() === 100)
    assert(got.columns.toSeq === Seq("id", "name", "score"))
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 100L).sum)
  }

  test("multi-snapshot append accumulates; snapshot-id time travel sees the past") {
    val root = freshRoot()
    IcebergWriter.create(spark, root, Seq(docs(0, 40)))
    IcebergWriter.append(spark, root, Seq(docs(40, 100)))
    assert(IcebergTable.read(spark, root).count() === 100)
    assert(IcebergTable.read(spark, root, snapshotId = Some(1L)).count() === 40)
    // timestamp travel: fixture stamps snapshot k at 1700000000000 + k*1000
    val atFirst = IcebergTable.read(spark, root,
      asOfTimestampMs = Some(1700000000000L + 1500))
    assert(atFirst.count() === 40)
  }

  test("manifest bounds prune files at the index (scan lists fewer files)") {
    val root = freshRoot()
    IcebergWriter.create(spark, root,
      Seq(docs(0, 100), docs(100, 200), docs(200, 300), docs(300, 400)))
    val snap = IcebergTable.snapshot(spark, root)
    assert(snap.dataFiles.size === 4)
    val got = IcebergTable.read(spark, root).filter(col("id") >= 350)
    assert(got.count() === 50)
    // the pruned plan's scan must list exactly the one matching file
    val scanned = got.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.files.length).sum
    }.sum
    assert(scanned === 1, s"expected 1 file after bounds pruning, scanned $scanned")
  }

  test("identity partition values prune without opening files") {
    val root = freshRoot()
    import spark.implicits._
    val parts = Seq("a", "b", "c").map(tag =>
      (0 until 20).map(i => (i.toLong, tag)).toDF("id", "tag"))
    IcebergWriter.create(spark, root, parts, partitionCol = Some("tag"))
    val got = IcebergTable.read(spark, root).filter(col("tag") === "b")
    assert(got.count() === 20)
    val scanned = got.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.files.length).sum
    }.sum
    assert(scanned === 1, s"expected 1 file after partition pruning, scanned $scanned")
  }

  test("v2 position deletes: dead rows vanish through the bitmap filter") {
    val root = freshRoot()
    IcebergWriter.create(spark, root, Seq(docs(0, 100)))
    val snap = IcebergTable.snapshot(spark, root)
    val dataPath = snap.dataFiles.head.path
    // data file written id-ordered (single partition preserves order):
    // kill physical rows 0..9 = ids 0..9
    IcebergWriter.addPositionDeletes(spark, root, Seq(dataPath -> (0L until 10L)))
    val got = IcebergTable.read(spark, root)
    assert(got.count() === 90)
    assert(got.agg(min("id")).head().getLong(0) === 10L)
    // pre-delete snapshot still serves every row
    assert(IcebergTable.read(spark, root, snapshotId = Some(1L)).count() === 100)
  }

  test("v2 equality deletes kill matching rows in strictly-older files only") {
    val root = freshRoot()
    import spark.implicits._
    IcebergWriter.create(spark, root, Seq(docs(0, 100)))
    IcebergWriter.addEqualityDeletes(spark, root,
      Seq(5L, 17L, 99L, 1234L).toDF("id"), Seq("id"))
    // re-appearing id in a NEWER snapshot must survive the older delete
    IcebergWriter.append(spark, root, Seq(docs(17, 18)))
    val got = IcebergTable.read(spark, root)
    assert(got.count() === 100 - 3 + 1)
    assert(got.filter(col("id") === 5L).count() === 0)
    assert(got.filter(col("id") === 17L).count() === 1) // the re-added one
  }

  test("rename-by-field-id: renamed column reads from files written under the old name") {
    val root = freshRoot()
    IcebergWriter.create(spark, root, Seq(docs(0, 30)))
    IcebergWriter.renameColumn(spark, root, "score", "points")
    val got = IcebergTable.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "name", "points"))
    assert(got.agg(round(sum("points"), 2)).head().getDouble(0) ===
      (0 until 30).map(_ * 10.0).sum)
  }

  test("format(\"graft-iceberg\") batch read with snapshot time travel") {
    val root = freshRoot()
    IcebergWriter.create(spark, root, Seq(docs(0, 60), docs(60, 90)))
    val got = spark.read.format("graft-iceberg").load(root)
    assert(got.count() === 90)
    // delete-free snapshots ride the pruning file index: one file scanned
    val pruned = got.filter(col("id") < 10)
    assert(pruned.count() === 10)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.files.length).sum
    }.sum
    assert(scanned === 1, s"expected 1 file, scanned $scanned")
    IcebergWriter.addPositionDeletes(spark, root,
      Seq(IcebergTable.snapshot(spark, root).dataFiles.head.path -> Seq(0L)))
    // snapshotId option pins the pre-delete state; current sees the delete
    assert(spark.read.format("graft-iceberg")
      .option("snapshotId", "1").load(root).count() === 90)
    assert(spark.read.format("graft-iceberg").load(root).count() === 89)
  }

  test("SQL over an Iceberg path through the graft catalog, with time travel") {
    val root = freshRoot()
    IcebergWriter.create(spark, root, Seq(docs(0, 25)))
    IcebergWriter.append(spark, root, Seq(docs(25, 40)))
    val n = spark.sql(s"SELECT count(*) AS n FROM graft.`$root`").head().getLong(0)
    assert(n === 40)
    val atFirst = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$root` VERSION AS OF 1").head().getLong(0)
    assert(atFirst === 25)
    val byTs = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$root` TIMESTAMP AS OF " +
        "TIMESTAMP'2023-11-14 22:13:21.5'").head().getLong(0) // between snap 1 and 2
    assert(byTs === 25)
    // write refusal: foreign tables are read-only through the catalog
    val err = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` VALUES (999, 'x', 1.0)")
    }
    assert(err.getMessage != null)
  }

  test("isIcebergTable detects the layout; loud errors otherwise") {
    val root = freshRoot()
    assert(!IcebergTable.isIcebergTable(spark, root))
    IcebergWriter.create(spark, root, Seq(docs(0, 5)))
    assert(IcebergTable.isIcebergTable(spark, root))
    val err = intercept[Exception] {
      IcebergTable.read(spark, root, snapshotId = Some(999L))
    }
    assert(err.getMessage.contains("999"))
  }
}
