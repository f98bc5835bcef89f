package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Row-level Change Data Feed (Delta `table_changes` parity): table
  * properties switch capture on, the mutation verbs stage minimal change
  * rows, readChangeFeed serves them per commit and synthesizes
  * insert/delete rows from file diffs for commits without capture. */
class ChangeFeedSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("cdc").toString + "/t"

  private def table(root: String): Unit = {
    ManifestTable.append(spark, root,
      spark.range(100).toDF("id").withColumn("v", col("id").cast("long")))
    ManifestTable.setProperty(spark, root, ManifestTable.CdcProperty, "true")
  }

  private def feed(root: String, from: Long, to: Long) =
    ManifestTable.readChangeFeed(spark, root, from, to)

  test("properties: set/unset, carried by every commit, restored by restore") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(10).toDF("id"))
    val vSet = ManifestTable.setProperty(spark, root, "graft.owner", "curation")
    assert(ManifestTable.properties(spark, root) == Map("graft.owner" -> "curation"))
    // an unrelated mutation must not drop the property
    ManifestTable.append(spark, root, spark.range(10, 20).toDF("id"))
    ManifestTable.delete(spark, root, col("id") < 3)
    assert(ManifestTable.properties(spark, root)("graft.owner") == "curation")
    // idempotent set returns without a new commit
    val vAgain = ManifestTable.setProperty(spark, root, "graft.owner", "curation")
    assert(ManifestTable.currentVersion(spark, root).get == vAgain)
    assert(ManifestTable.unsetProperty(spark, root, "graft.owner").nonEmpty)
    assert(ManifestTable.properties(spark, root).isEmpty)
    assert(ManifestTable.unsetProperty(spark, root, "graft.owner").isEmpty, "no-op unset")
    // restore brings the set-point's properties back
    ManifestTable.restore(spark, root, vSet)
    assert(ManifestTable.properties(spark, root)("graft.owner") == "curation")
  }

  test("delete captures exactly the deleted rows") {
    val root = freshRoot()
    table(root)
    val v = ManifestTable.delete(spark, root, col("id").between(10, 19)).get
    val f = feed(root, v - 1, v)
    assert(f.columns.toSeq == Seq("id", "v", "_change_type", "_commit_version"))
    val rows = f.collect()
    assert(rows.length == 10, s"minimal capture: 10 deleted rows, got ${rows.length}")
    assert(rows.forall(_.getString(2) == "delete"))
    assert(rows.forall(_.getLong(3) == v))
    assert(rows.map(_.getLong(0)).sorted.toSeq == (10L to 19L))
  }

  test("update captures pre/post pairs evaluated over the old row") {
    val root = freshRoot()
    table(root)
    val v = ManifestTable.update(spark, root, col("id") < 5,
      Map("v" -> (col("v") * 100))).get
    val f = feed(root, v - 1, v).collect()
    assert(f.length == 10, "5 preimages + 5 postimages")
    val pre = f.filter(_.getString(2) == "update_preimage").map(r => r.getLong(0) -> r.getLong(1)).toMap
    val post = f.filter(_.getString(2) == "update_postimage").map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach { i =>
      assert(pre(i) == i && post(i) == i * 100, s"row $i: pre=${pre(i)} post=${post(i)}")
    }
  }

  test("merge captures update pairs, inserts, and tombstone deletes") {
    import spark.implicits._
    val root = freshRoot()
    table(root)
    // update ids 1,2; insert 200,201; tombstone-delete 3
    val updates = Seq(
      (1L, -1L, false), (2L, -2L, false),
      (200L, 200L, false), (201L, 201L, false),
      (3L, 0L, true)).toDF("id", "v", "_tomb")
    val v = ManifestTable.merge(spark, root, updates, Seq("id"),
      deleteCol = Some("_tomb")).get
    val f = feed(root, v - 1, v).collect()
    val byType = f.groupBy(_.getString(2)).view.mapValues(_.map(_.getLong(0)).sorted.toSeq).toMap
    assert(byType("update_preimage") == Seq(1L, 2L))
    assert(byType("update_postimage") == Seq(1L, 2L))
    assert(byType("insert") == Seq(200L, 201L))
    assert(byType("delete") == Seq(3L))
    // postimages carry the NEW values
    assert(f.filter(r => r.getString(2) == "update_postimage").map(_.getLong(1)).sorted.toSeq ==
      Seq(-2L, -1L))
  }

  test("fallback synthesis: appends are inserts; a CDC-off rewrite folds correctly") {
    val root = freshRoot()
    // CDC never enabled
    ManifestTable.append(spark, root,
      spark.range(100).toDF("id").withColumn("v", col("id").cast("long")))
    ManifestTable.append(spark, root,
      spark.range(100, 120).toDF("id").withColumn("v", col("id").cast("long")))
    val v2 = ManifestTable.currentVersion(spark, root).get
    val inserts = feed(root, v2 - 1, v2)
    assert(inserts.filter(col("_change_type") === "insert").count() == 20)
    assert(inserts.count() == 20)
    // a delete without capture synthesizes delete+insert pairs from the
    // rewrite; the SIGNED fold still lands on the truth
    val v3 = ManifestTable.delete(spark, root, col("id") === 50L).get
    val folded = feed(root, v3 - 1, v3)
      .groupBy("id").agg(sum(when(col("_change_type") === "insert", 1)
        .otherwise(-1)).as("net"))
      .filter(col("net") =!= 0)
    assert(folded.count() == 1, "net change = exactly the deleted row")
    assert(folded.head.getLong(0) == 50L)
    // compaction is invisible
    ManifestTable.compact(spark, root)
    val v4 = ManifestTable.currentVersion(spark, root).get
    assert(v4 > v3 && feed(root, v3, v4).count() == 0)
  }

  test("mid-history enablement: one feed spans synthesized and captured commits") {
    val root = freshRoot()
    ManifestTable.append(spark, root,
      spark.range(10).toDF("id").withColumn("v", col("id").cast("long")))
    ManifestTable.append(spark, root,
      spark.range(10, 20).toDF("id").withColumn("v", col("id").cast("long")))
    ManifestTable.setProperty(spark, root, ManifestTable.CdcProperty, "true")
    val vDel = ManifestTable.delete(spark, root, col("id") === 15L).get
    val f = feed(root, 1, vDel)
    // v2 append synthesized (10 inserts), setProperty invisible
    // (dataChange:false), captured delete = 1 minimal row
    assert(f.filter(col("_change_type") === "insert").count() == 10)
    assert(f.filter(col("_change_type") === "delete").count() == 1)
    assert(f.count() == 11)
  }

  test("""reader options: .option("readChangeFeed") serves the feed through format("graft")""") {
    val root = freshRoot()
    table(root) // v1 create, v2 set-property
    val vDel = ManifestTable.delete(spark, root, col("id") < 10).get
    def read(opts: (String, String)*) = {
      val r = spark.read.format("graft").option("readChangeFeed", "true")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(root)
    }
    // startingVersion is INCLUSIVE; endingVersion defaults to the latest
    val del = read("startingVersion" -> vDel.toString)
    assert(del.columns.toSeq == Seq("id", "v", "_change_type", "_commit_version"))
    assert(del.count() == 10 &&
      del.filter(col("_change_type") === "delete").count() == 10)
    // startingVersion 0 and 1 both start at table creation (first commit = v1)
    Seq("0", "1").foreach { s =>
      val full = read("startingVersion" -> s, "endingVersion" -> vDel.toString)
      assert(full.filter(col("_change_type") === "insert").count() == 100, s"from $s")
      assert(full.count() == 110, s"from $s")
    }
    // bounded range excludes the delete
    assert(read("startingVersion" -> "1", "endingVersion" -> (vDel - 1).toString)
      .filter(col("_change_type") === "delete").count() == 0)
    // the feed frame composes with ordinary operators (filter + aggregate)
    assert(read("startingVersion" -> "1")
      .filter(col("_change_type") === "insert")
      .agg(sum("v")).head.getLong(0) == (0L until 100L).sum)
    // guard rails: startingVersion required; time travel doesn't compose
    assert(intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readChangeFeed", "true").load(root)
    }.getMessage.contains("startingVersion"))
    assert(intercept[IllegalArgumentException] {
      read("startingVersion" -> "1", "versionAsOf" -> "1").collect()
    }.getMessage.contains("compose"))
  }

  test("streaming CDF: snapshot inserts first, then each commit's change rows") {
    import spark.implicits._
    val root = freshRoot()
    table(root) // 100 rows, CDC on
    val snapV = ManifestTable.currentVersion(spark, root).get
    val q = spark.readStream.format("graft").option("readChangeFeed", "true").load(root)
      .writeStream.format("memory").queryName("cdf_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val sink = () => spark.table("cdf_stream")
      assert(sink().columns.toSeq == Seq("id", "v", "_change_type", "_commit_version"))
      // first batch: initial snapshot as inserts at the snapshot version
      assert(sink().count() == 100)
      assert(sink().filter(col("_change_type") === "insert" &&
        col("_commit_version") === snapV).count() == 100)

      // a captured delete streams through as minimal delete rows
      val vDel = ManifestTable.delete(spark, root, col("id") < 10).get
      q.processAllAvailable()
      assert(sink().filter(col("_change_type") === "delete").count() == 10)
      assert(sink().filter(col("_commit_version") === vDel).count() == 10,
        "the delete commit contributes exactly its captured rows")

      // an update streams pre/post pairs; an append streams inserts
      ManifestTable.update(spark, root, col("id") === 50L, Map("v" -> lit(-1L)))
      ManifestTable.append(spark, root, Seq((1000L, 1000L)).toDF("id", "v"))
      q.processAllAvailable()
      assert(sink().filter(col("_change_type") === "update_preimage").count() == 1)
      assert(sink().filter(col("_change_type") === "update_postimage" &&
        col("v") === -1L).count() == 1)
      assert(sink().filter(col("_change_type") === "insert" &&
        col("id") === 1000L).count() == 1)
      // signed fold over the whole stream = the table's current count
      val net = sink().agg(sum(when(col("_change_type").isin("insert", "update_postimage"), 1)
        .when(col("_change_type").isin("delete", "update_preimage"), -1))).head.getLong(0)
      assert(net == ManifestTable.read(spark, root).count(),
        "insert/delete/update rows must fold to the live row count")
    } finally q.stop()
  }

  test("wide version ranges fail loud at the union cap, pointing at paging") {
    val root = freshRoot()
    table(root)
    (0 until 4).foreach(i => ManifestTable.append(spark, root,
      spark.range(100 + i, 101 + i).toDF("id").withColumn("v", col("id"))))
    val v = ManifestTable.currentVersion(spark, root).get
    spark.conf.set("spark.graft.changeFeed.maxUnionParts", "3")
    try {
      val e = intercept[IllegalArgumentException] { feed(root, 0, v) }
      assert(e.getMessage.contains("maxUnionParts") && e.getMessage.contains("incrementally"))
      // paging the same range stays under the cap and serves every row
      val paged = feed(root, 0, 3).unionByName(feed(root, 3, v))
      spark.conf.unset("spark.graft.changeFeed.maxUnionParts")
      assert(paged.count() == feed(root, 0, v).count())
    } finally spark.conf.unset("spark.graft.changeFeed.maxUnionParts")
  }

  test("vacuum reclaims cdc files with their manifests; vacuumed feed fails loud") {
    val root = freshRoot()
    table(root)
    val vDel = ManifestTable.delete(spark, root, col("id") < 10).get
    ManifestTable.compact(spark, root)
    ManifestTable.compact(spark, root) // more history to drop
    assert(new java.io.File(s"$root/cdc").listFiles().nonEmpty)
    ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    val left = Option(new java.io.File(s"$root/cdc").listFiles()).map(_.length).getOrElse(0)
    assert(left == 0, s"cdc files of vacuumed manifests must be reclaimed, $left left")
    assert(intercept[IllegalStateException] {
      feed(root, vDel - 1, vDel).collect()
    }.getMessage.contains("vacuumed"))
    // the table itself is unharmed
    assert(ManifestTable.read(spark, root).count() == 90)
  }
}
