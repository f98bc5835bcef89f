package graft

import graft.sources.ManifestTable
import java.nio.file.Files

/** ACID properties of the manifest commit protocol: readers only ever see
  * committed snapshots, a writer killed mid-compaction changes nothing,
  * racing committers don't lose each other's rows. */
class ManifestTableSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("manifest").toString + "/t"

  test("append commits versioned snapshots; reads are snapshot-consistent") {
    val root = freshRoot()
    val v1 = ManifestTable.append(spark, root, spark.range(100).toDF("id"))
    assert(v1 == 1)
    val v2 = ManifestTable.append(spark, root, spark.range(100, 150).toDF("id"))
    assert(v2 == 2)
    assert(ManifestTable.read(spark, root).count() == 150)
    // time travel: version 1 still reads its own snapshot
    assert(ManifestTable.read(spark, root, Some(1L)).count() == 100)
  }

  test("uncommitted data files are invisible to readers (mid-compaction kill)") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(1000).toDF("id"))
    val before = ManifestTable.read(spark, root).count()
    // simulate a compactor killed after the rewrite but before the commit:
    // fully-formed parquet lands in data/ with no manifest referencing it
    spark.range(5000).toDF("id").write.parquet(root + "/_staging/deadbeef")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(root + "/_staging/deadbeef"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        assert(fs.rename(st.getPath,
          new org.apache.hadoop.fs.Path(root + "/data/deadbeef-" + st.getPath.getName)))
      }
    assert(ManifestTable.read(spark, root).count() == before,
      "orphaned data files leaked into the read path")
    // the next vacuum reclaims the orphans (age floor 0: the "crash" was now)
    assert(ManifestTable.vacuum(spark, root, minAgeMs = 0) > 0)
    assert(ManifestTable.read(spark, root).count() == before)
  }

  test("compaction is one atomic commit: fewer files, same rows, old snapshot intact") {
    val root = freshRoot()
    // fragmented table: 40 tiny files across two commits
    ManifestTable.append(spark, root, spark.range(500).toDF("id").repartition(20))
    ManifestTable.append(spark, root, spark.range(500, 1000).toDF("id").repartition(20))
    val preVersion = ManifestTable.currentVersion(spark, root).get
    val preFiles = ManifestTable.read(spark, root).inputFiles.length
    assert(preFiles == 40)
    val v = ManifestTable.compact(spark, root, targetFileMb = 128)
    assert(v == preVersion + 1)
    val post = ManifestTable.read(spark, root)
    assert(post.inputFiles.length < preFiles)
    assert(post.count() == 1000)
    import spark.implicits._
    assert(post.as[Long].collect().sorted.toSeq == (0L until 1000L))
    // pre-compaction snapshot still readable until vacuumed
    assert(ManifestTable.read(spark, root, Some(preVersion)).count() == 1000)
    assert(ManifestTable.read(spark, root, Some(preVersion)).inputFiles.length == 40)
  }

  test("an externally committed version is honored: append lands after it, keeping its rows") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(10).toDF("id"))
    // interloper commits v2 outside this API: stage a parquet file and
    // write the manifest by hand (v1's file list + the new file)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    spark.range(10, 20).toDF("id").coalesce(1).write.parquet(root + "/_staging/intruder")
    val stagedName = fs.listStatus(new org.apache.hadoop.fs.Path(root + "/_staging/intruder"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(stagedName,
      new org.apache.hadoop.fs.Path(root + "/data/intruder-" + stagedName.getName)))
    val v1Files = scala.io.Source.fromInputStream(
      fs.open(new org.apache.hadoop.fs.Path(root + f"/_manifests/v${1L}%020d.manifest")), "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    val v2 = new org.apache.hadoop.fs.Path(root + f"/_manifests/v${2L}%020d.manifest")
    val out = fs.create(v2, false)
    out.write(((v1Files :+ s"data/intruder-${stagedName.getName}").mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
    // an append computed after the interloper must land at v3 and keep its rows
    val v = ManifestTable.append(spark, root, spark.range(20, 30).toDF("id"))
    assert(v == 3)
    assert(ManifestTable.read(spark, root).count() == 30)
  }

  test("overwrite replaces contents in one commit") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(100).toDF("id"))
    ManifestTable.overwrite(spark, root, spark.range(7).toDF("id"))
    assert(ManifestTable.read(spark, root).count() == 7)
  }

  test("exactly-once append: replayed and out-of-order batches are skipped") {
    val root = freshRoot()
    assert(ManifestTable.exactlyOnceAppend(spark, root, spark.range(10).toDF("id"), "writerA", 0L).contains(1L))
    // replay of batch 0 after a crash-post-commit: no new version, no dup rows
    assert(ManifestTable.exactlyOnceAppend(spark, root, spark.range(10).toDF("id"), "writerA", 0L).isEmpty)
    assert(ManifestTable.exactlyOnceAppend(spark, root, spark.range(10, 15).toDF("id"), "writerA", 1L).contains(2L))
    // stale batch behind the high-water mark
    assert(ManifestTable.exactlyOnceAppend(spark, root, spark.range(99).toDF("id"), "writerA", 0L).isEmpty)
    // an independent writer has its own mark
    assert(ManifestTable.exactlyOnceAppend(spark, root, spark.range(15, 18).toDF("id"), "writerB", 0L).contains(3L))
    assert(ManifestTable.read(spark, root).count() == 18)
    assert(ManifestTable.currentVersion(spark, root).contains(3L))
  }

  test("exactly-once append leaves no orphan data from a skipped replay") {
    val root = freshRoot()
    ManifestTable.exactlyOnceAppend(spark, root, spark.range(5).toDF("id"), "w", 0L)
    ManifestTable.exactlyOnceAppend(spark, root, spark.range(5).toDF("id"), "w", 0L) // skip path
    // vacuum reports zero unreferenced files: the skipped attempt cleaned up
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0) == 0)
    assert(ManifestTable.read(spark, root).count() == 5)
  }

  test("exactly-once writer drives streaming foreachBatch into the table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = freshRoot()
    val input = MemoryStream[Long]
    val q = input.toDF().writeStream
      .foreachBatch(ManifestTable.exactlyOnceWriter(root, "stream-1"))
      .start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L)
      q.processAllAvailable()
    } finally q.stop()
    assert(ManifestTable.read(spark, root).count() == 4)
  }

  test("empty snapshot reads as a typed empty frame (schema carried in the manifest)") {
    val root = freshRoot()
    import org.apache.spark.sql.functions.lit
    val df = spark.range(10).toDF("id").withColumn("tag", lit("x"))
    ManifestTable.append(spark, root, df)
    // overwrite with a ZERO-partition empty frame — stages no parquet parts,
    // so v2's manifest lists no data files at all
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
    assert(empty.rdd.getNumPartitions == 0)
    ManifestTable.overwrite(spark, root, empty)
    val back = ManifestTable.read(spark, root)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("id", "tag"))
    // the pre-overwrite snapshot still time-travels
    assert(ManifestTable.read(spark, root, Some(1L)).count() == 10)
    // a manifest carrying ONLY the schema line reads as the typed empty
    // frame regardless of how the writer staged its (zero) part files
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_manifests", "v%020d.manifest".format(50L)),
      ("# schema:" + df.schema.json + "\n").getBytes)
    val typed = ManifestTable.read(spark, root, Some(50L))
    assert(typed.count() == 0)
    assert(typed.schema.fieldNames.toSeq == Seq("id", "tag"))
    // a manifest with neither files nor schema (pre-schema format) gets the
    // clear error, not a parquet schema-inference crash
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_manifests", "v%020d.manifest".format(99L)),
      "\n".getBytes)
    val e = intercept[IllegalStateException] { ManifestTable.read(spark, root, Some(99L)) }
    assert(e.getMessage.contains("no data files"), e.getMessage)
  }

  test("commit refuses non-atomic-rename stores unless explicitly allowed") {
    val e = intercept[IllegalStateException] {
      ManifestTable.append(spark, "s3a://bucket/table", spark.range(1).toDF("id"))
    }
    assert(e.getMessage.contains("not atomic"), e.getMessage)
    assert(e.getMessage.contains(ManifestTable.AllowNonAtomicKey), e.getMessage)
    // opting in moves past the guard (and then fails on the absent s3a impl,
    // which is the expected failure mode in this sandbox)
    spark.conf.set(ManifestTable.AllowNonAtomicKey, "true")
    try intercept[Exception] {
      ManifestTable.append(spark, "s3a://bucket/table", spark.range(1).toDF("id"))
    } finally spark.conf.unset(ManifestTable.AllowNonAtomicKey)
  }

  test("vacuum retention guard spares young unreferenced files (in-flight writers)") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(3).toDF("id"))
    // a writer mid-commit: data file moved into data/, manifest not yet renamed
    val orphan = new org.apache.hadoop.fs.Path(s"$root/data/zz-inflight.parquet")
    val fs = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(orphan, false).close()
    // default retention: the young unreferenced file must survive
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1) == 0)
    assert(fs.exists(orphan))
    // past retention (age floor 0) it is reclaimable
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0) == 1)
    assert(!fs.exists(orphan))
  }

  test("vacuum drops old versions and their files but keeps the live snapshot") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(100).toDF("id").repartition(10))
    ManifestTable.compact(spark, root)
    val removed = ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0)
    assert(removed == 10) // the 10 pre-compaction fragments
    assert(ManifestTable.read(spark, root).count() == 100)
    intercept[Exception] { ManifestTable.read(spark, root, Some(1L)).count() }
  }
}
