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

  private def setManifestMtime(root: String, v: Long, ts: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.setTimes(new org.apache.hadoop.fs.Path(f"$root/_manifests/v$v%020d.manifest"), ts, -1)
  }

  test("vacuum(retentionMs): versions inside the retention window survive, older reclaim") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(10).toDF("id").repartition(1))  // v1
    ManifestTable.append(spark, root, spark.range(10, 20).toDF("id").repartition(1)) // v2
    ManifestTable.overwrite(spark, root, spark.range(30).toDF("id").repartition(1)) // v3
    val now = System.currentTimeMillis()
    setManifestMtime(root, 1, now - 10 * 3600 * 1000L) // 10h old
    setManifestMtime(root, 2, now - 30 * 60 * 1000L)   // 30min old
    setManifestMtime(root, 3, now)
    // dry run counts the same reclaim the real run performs
    val wouldRemove = ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0,
      dryRun = true, retentionMs = Some(3600 * 1000L))
    val removed = ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0,
      retentionMs = Some(3600 * 1000L))
    assert(removed == wouldRemove)
    // v1 (10h) is beyond the 1h retention: reclaimed; v2 (30min) survives
    intercept[Exception] { ManifestTable.read(spark, root, Some(1L)).count() }
    assert(ManifestTable.read(spark, root, Some(2L)).count() == 20)
    assert(ManifestTable.read(spark, root).count() == 30)
    // a later count-only vacuum still reclaims v2 once retention allows
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0,
      retentionMs = Some(60 * 1000L)) >= 1)
    intercept[Exception] { ManifestTable.read(spark, root, Some(2L)).count() }
  }

  test("vacuum(retentionMs) monotonizes clock-skewed commit times like versionAsOf") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(10).toDF("id").repartition(1))  // v1
    ManifestTable.append(spark, root, spark.range(10, 20).toDF("id").repartition(1)) // v2
    ManifestTable.append(spark, root, spark.range(20, 30).toDF("id").repartition(1)) // v3
    val now = System.currentTimeMillis()
    setManifestMtime(root, 1, now)                      // fresh
    setManifestMtime(root, 2, now - 10 * 3600 * 1000L)  // skewed: older than v1
    setManifestMtime(root, 3, now)
    ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0,
      retentionMs = Some(3600 * 1000L))
    // raw mtimes would reclaim v2; monotonized over version order it
    // inherits v1's fresh clock and must survive
    assert(ManifestTable.read(spark, root, Some(2L)).count() == 20)
  }

  test("metadata-only commits carry a per-writer nonce: identical logical commits differ in bytes") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(10).toDF("id")) // v1
    ManifestTable.restore(spark, root, 1L) // v2: same files, same headers
    ManifestTable.restore(spark, root, 1L) // v3: logically identical to v2
    def bytes(v: Long): Seq[Byte] = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_manifests", f"v$v%020d.manifest")).toSeq
    assert(bytes(2) != bytes(3),
      "racing writers of byte-identical manifests could BOTH win conditional-PUT resolution")
    // and the nonce is transparent to readers
    assert(ManifestTable.read(spark, root, Some(2L)).count() == 10)
    assert(ManifestTable.read(spark, root, Some(3L)).count() == 10)
  }

  // ------------------------------------------------- partitioned layout

  import org.apache.spark.sql.functions.{col, concat, lit, pmod}

  /** 100 rows across days d0..d3 (25 each), id 0..99. */
  private def daysDf(start: Int = 0, n: Int = 100) = {
    spark.range(start, start + n).toDF("id")
      .withColumn("day", concat(lit("2024-01-0"), (pmod(col("id"), lit(4)) + 1).cast("string")).cast("date"))
      .withColumn("v", (col("id") * 10).cast("long"))
  }

  test("partitioned append: hive subdirs, partition column read back typed, in declared order") {
    val root = freshRoot()
    ManifestTable.append(spark, root, daysDf(), partitionBy = Seq("day"))
    val back = ManifestTable.read(spark, root)
    assert(back.schema.fieldNames.toSeq == Seq("id", "day", "v")) // declared order, not part-cols-last
    assert(back.schema("day").dataType == org.apache.spark.sql.types.DateType)
    assert(back.count() == 100)
    assert(back.filter(col("day") === lit("2024-01-02").cast("date")).count() == 25)
    // data files really live under hive-style partition dirs
    assert(back.inputFiles.forall(_.contains("/day=2024-01-0")))
    // layout is sticky: an append can't silently change it
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root, daysDf(100), partitionBy = Seq("v"))
    }
    assert(e.getMessage.contains("partitioned by"), e.getMessage)
    // but an unadorned append inherits it
    ManifestTable.append(spark, root, daysDf(100))
    assert(ManifestTable.read(spark, root).count() == 200)
    assert(ManifestTable.read(spark, root).inputFiles.forall(_.contains("/day=")))
  }

  test("replaceWhere: re-running a day's load converges to one copy, atomically") {
    val root = freshRoot()
    ManifestTable.append(spark, root, daysDf(), partitionBy = Seq("day"))
    val v1 = ManifestTable.currentVersion(spark, root).get
    val day2 = lit("2024-01-02").cast("date")
    // the corrected re-run of day 2: same ids, values shifted by +1
    val corrected = daysDf().filter(col("day") === day2).withColumn("v", col("v") + 1)
    val v2 = ManifestTable.replaceWhere(spark, root, corrected, col("day") === day2)
    assert(v2 == v1 + 1)
    val after = ManifestTable.read(spark, root)
    assert(after.count() == 100, "replace must not duplicate the day")
    import spark.implicits._
    val day2Vs = after.filter(col("day") === day2).select("v").as[Long].collect().sorted
    assert(day2Vs.forall(v => v % 10 == 1), "day 2 must carry ONLY the corrected rows")
    assert(after.filter(col("day") =!= day2).select("v").as[Long].collect().forall(_ % 10 == 0),
      "other days must be untouched")
    // idempotent: running the same day again changes nothing but the version
    ManifestTable.replaceWhere(spark, root, corrected, col("day") === day2)
    assert(ManifestTable.read(spark, root).count() == 100)
    // readers never see a partial state: the pre-replace snapshot is intact
    val before = ManifestTable.read(spark, root, Some(v1))
    assert(before.count() == 100)
    assert(before.filter(col("day") === day2).select("v").as[Long].collect().forall(_ % 10 == 0))
    // and once vacuumed, the replaced files are reclaimed (recursively,
    // inside the partition dirs)
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0) > 0)
    assert(ManifestTable.read(spark, root).count() == 100)
  }

  test("replaceWhere guards: row outside the region, unpartitioned table, non-partition predicate") {
    val root = freshRoot()
    ManifestTable.append(spark, root, daysDf(), partitionBy = Seq("day"))
    val day2 = lit("2024-01-02").cast("date")
    // rows that don't satisfy the predicate would duplicate on re-run
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.replaceWhere(spark, root, daysDf(), col("day") === day2)
    }
    assert(e1.getMessage.contains("satisfy the predicate"), e1.getMessage)
    // the failed attempt cleaned up its staged files: nothing to vacuum
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0) == 0)
    // a predicate over a non-partition column cannot prune files
    intercept[Exception] {
      ManifestTable.replaceWhere(spark, root,
        daysDf().filter(col("v") === 10), col("v") === 10)
    }
    // unpartitioned tables have no file-granularity regions
    val flat = freshRoot()
    ManifestTable.append(spark, flat, daysDf())
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.replaceWhere(spark, flat, daysDf().filter(col("day") === day2), col("day") === day2)
    }
    assert(e2.getMessage.contains("must be partitioned"), e2.getMessage)
  }

  // ---------------------------------------------------- schema evolution

  test("schema drift fails fast; mergeSchema=true evolves add-column; old versions keep their schema") {
    val root = freshRoot()
    val v1df = spark.range(10).toDF("id").withColumn("a", lit("x"))
    ManifestTable.append(spark, root, v1df)
    // silent drift is refused (append, overwrite, exactly-once alike)
    val drifted = spark.range(10, 20).toDF("id").withColumn("b", lit(1L))
    val e = intercept[IllegalArgumentException] { ManifestTable.append(spark, root, drifted) }
    assert(e.getMessage.contains("schema drift"), e.getMessage)
    intercept[IllegalArgumentException] { ManifestTable.overwrite(spark, root, drifted) }
    intercept[IllegalArgumentException] {
      ManifestTable.exactlyOnceAppend(spark, root, drifted, "w", 0L)
    }
    // failed attempts left nothing staged
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0) == 0)
    // type changes are not evolution, even with mergeSchema
    val retyped = spark.range(10, 20).toDF("id").withColumn("a", lit(7L))
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root, retyped, mergeSchema = true)
    }
    assert(e2.getMessage.contains("cannot evolve column a"), e2.getMessage)
    // add-column evolution: new column appended, nullable
    val evolved = spark.range(10, 20).toDF("id")
      .withColumn("a", lit("y")).withColumn("b", lit(1L))
    val v2 = ManifestTable.append(spark, root, evolved, mergeSchema = true)
    val now = ManifestTable.read(spark, root)
    assert(now.schema.fieldNames.toSeq == Seq("id", "a", "b"))
    assert(now.count() == 20)
    // files written before the add read the new column as null
    import spark.implicits._
    assert(now.filter(col("b").isNull).count() == 10)
    assert(now.filter(col("b") === 1L).count() == 10)
    // a reader pinned at v1 — concurrent with the evolving commit — still
    // sees the OLD schema, exactly its snapshot
    val old = ManifestTable.read(spark, root, Some(v2 - 1))
    assert(old.schema.fieldNames.toSeq == Seq("id", "a"))
    assert(old.count() == 10)
    // a writer of the OLD shape keeps working post-evolution (its columns
    // are a prefix of the merged schema; the missing column stays null)
    ManifestTable.append(spark, root, spark.range(20, 25).toDF("id").withColumn("a", lit("z")),
      mergeSchema = true)
    val all = ManifestTable.read(spark, root)
    assert(all.count() == 25)
    assert(all.schema.fieldNames.toSeq == Seq("id", "a", "b"))
    assert(all.filter(col("b").isNull).count() == 15)
  }

  // --------------------------------------------------- incremental reads

  test("changesBetween: appended rows only; compaction invisible; vacuumed range fails loud") {
    val root = freshRoot()
    import spark.implicits._
    val v1 = ManifestTable.append(spark, root, spark.range(100).toDF("id"))           // v1
    val v2 = ManifestTable.append(spark, root, spark.range(100, 150).toDF("id"))      // v2
    val v3 = ManifestTable.compact(spark, root)                                       // v3 (no data change)
    val v4 = ManifestTable.append(spark, root, spark.range(150, 160).toDF("id"))      // v4
    // (v1, v4]: the two appends, nothing from the compaction rewrite
    val inc = ManifestTable.changesBetween(spark, root, v1, v4)
    assert(inc.as[Long].collect().sorted.toSeq == (100L until 160L))
    // (v2, v3]: pure compaction range = typed empty
    val none = ManifestTable.changesBetween(spark, root, v2, v3)
    assert(none.count() == 0)
    assert(none.schema.fieldNames.toSeq == Seq("id"))
    // (0, v1]: since creation
    assert(ManifestTable.changesBetween(spark, root, 0L, v1).as[Long].collect().sorted.toSeq
      == (0L until 100L))
    // beyond the head is a caller bug
    intercept[IllegalArgumentException] {
      ManifestTable.changesBetween(spark, root, v1, v4 + 10)
    }
    // a vacuumed manifest inside the range fails loud, not under-reports
    ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0)
    val e = intercept[IllegalStateException] {
      ManifestTable.changesBetween(spark, root, v1, v4)
    }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("changesBetween surfaces evolved columns with nulls for pre-evolution files") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(5).toDF("id"))
    ManifestTable.append(spark, root,
      spark.range(5, 8).toDF("id").withColumn("tag", lit("t")), mergeSchema = true)
    val inc = ManifestTable.changesBetween(spark, root, 0L, 2L)
    assert(inc.schema.fieldNames.toSeq == Seq("id", "tag"))
    assert(inc.count() == 8)
    assert(inc.filter(col("tag").isNull).count() == 5)
  }

  test("compaction carries concurrent appends and refuses to resurrect removed files") {
    val root = freshRoot()
    ManifestTable.append(spark, root, daysDf(), partitionBy = Seq("day"))
    // interleave: a "slow compactor" read its snapshot, then an append
    // lands before it commits. Simulate by appending between the snapshot
    // read and the commit — compact() re-reads the snapshot per attempt,
    // so drive the interleaving through the manifest directly: compact,
    // then verify a normal sequential append+compact keeps all rows.
    ManifestTable.append(spark, root, daysDf(100))
    ManifestTable.compact(spark, root)
    assert(ManifestTable.read(spark, root).count() == 200)
    // partitioned compaction preserves the hive layout
    assert(ManifestTable.read(spark, root).inputFiles.forall(_.contains("/day=")))
    // and the partition column still reads back
    assert(ManifestTable.read(spark, root)
      .filter(col("day") === lit("2024-01-01").cast("date")).count() == 50)
  }

  test("exactlyOnceOverwrite: replay is a no-op and leaves no orphan staging data") {
    val root = freshRoot()
    assert(ManifestTable.exactlyOnceOverwrite(spark, root,
      spark.range(10).toDF("id"), "refresher", 1L).contains(1L))
    // replay of the same batch: skipped pre-staging, no new version
    assert(ManifestTable.exactlyOnceOverwrite(spark, root,
      spark.range(99).toDF("id"), "refresher", 1L).isEmpty)
    assert(ManifestTable.read(spark, root).count() == 10)
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0) == 0,
      "skipped replay must not leave unreferenced files")
    // a later batch replaces contents and advances the mark
    assert(ManifestTable.exactlyOnceOverwrite(spark, root,
      spark.range(3).toDF("id"), "refresher", 2L).contains(2L))
    assert(ManifestTable.read(spark, root).count() == 3)
    assert(ManifestTable.txnHighWaterMark(spark, root, "refresher").contains(2L))
  }

  test("exactlyOnceOverwrite keeps the table's partition layout by default") {
    val root = freshRoot()
    val days = daysDf()
    ManifestTable.append(spark, root, days, partitionBy = Seq("day"))
    // a refresh that says nothing about layout must not flatten the table
    assert(ManifestTable.exactlyOnceOverwrite(spark, root,
      daysDf(n = 60), "refresher", 1L).contains(2L))
    assert(ManifestTable.read(spark, root).inputFiles.forall(_.contains("/day=")),
      "refresh silently dropped the hive partition layout")
    assert(ManifestTable.read(spark, root).count() == 60)
  }

  test("exactlyOnceOverwrite priorMark: a concurrent refresher's commit aborts the stale fold") {
    val root = freshRoot()
    assert(ManifestTable.exactlyOnceOverwrite(spark, root,
      spark.range(10).toDF("id"), "refresher", 1L, priorMark = Some(None)).contains(1L))
    // refresher A computes its fold from mark=1 … meanwhile B commits batch 2
    assert(ManifestTable.exactlyOnceOverwrite(spark, root,
      spark.range(20).toDF("id"), "refresher", 2L).contains(2L))
    // …A now tries to publish a fold computed from mark=1 as batch 3: the
    // mark moved, so publishing would double-count B's range — must throw
    intercept[java.util.ConcurrentModificationException] {
      ManifestTable.exactlyOnceOverwrite(spark, root,
        spark.range(99).toDF("id"), "refresher", 3L, priorMark = Some(Some(1L)))
    }
    assert(ManifestTable.read(spark, root).count() == 20, "stale fold must not publish")
    // the aborted attempt leaves no orphans
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0) >= 0)
    // recomputed against the fresh mark, the same batch commits
    assert(ManifestTable.exactlyOnceOverwrite(spark, root,
      spark.range(30).toDF("id"), "refresher", 3L, priorMark = Some(Some(2L))).contains(3L))
    assert(ManifestTable.read(spark, root).count() == 30)
  }

  test("history lists versions newest-first with operation verbs; vacuum dryRun touches nothing") {
    val root = freshRoot()
    ManifestTable.append(spark, root, daysDf(), partitionBy = Seq("day"))
    ManifestTable.merge(spark, root, daysDf(n = 10).withColumn("v", lit(1L)), Seq("id", "day"))
    ManifestTable.delete(spark, root, col("id") === 99)
    ManifestTable.compact(spark, root)
    val h = ManifestTable.history(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getBoolean(3)))
    assert(h.map(_._1).toSeq == Seq(4L, 3L, 2L, 1L), "newest first")
    assert(h.map(_._2).toSeq == Seq("compact", "delete", "merge", "append"))
    assert(h.collect { case (_, "compact", dc) => dc }.head == false,
      "compaction must report dataChange=false")
    // dry run counts the superseded files but deletes nothing
    val wouldReclaim = ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0, dryRun = true)
    assert(wouldReclaim > 0)
    assert(ManifestTable.read(spark, root, Some(1L)).count() == 100,
      "dry run must not reclaim time travel")
    assert(ManifestTable.history(spark, root).count() == 4, "dry run must keep manifests")
    // the real vacuum then reclaims exactly what the dry run counted
    assert(ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0) == wouldReclaim)
  }

  test("restore rolls back to a prior version as a new commit, preserving history") {
    val root = freshRoot()
    import spark.implicits._
    ManifestTable.append(spark, root, spark.range(10).toDF("id"))
    ManifestTable.append(spark, root, spark.range(10, 50).toDF("id"))
    ManifestTable.overwrite(spark, root, spark.range(100, 103).toDF("id"))
    val v = ManifestTable.restore(spark, root, version = 2)
    assert(v == 4)
    assert(ManifestTable.read(spark, root).as[Long].collect().sorted.toSeq == (0L until 50L))
    // history linear: the overwritten v3 still reads its own snapshot
    assert(ManifestTable.read(spark, root, Some(3L)).count() == 3)
    // restore of the restore: back to the overwrite's contents
    ManifestTable.restore(spark, root, version = 3)
    assert(ManifestTable.read(spark, root).count() == 3)
    // incremental readers see the restore as a removal commit, not a
    // silent re-add of already-folded rows
    val e = intercept[IllegalStateException] {
      ManifestTable.changesBetween(spark, root, 2, 5)
    }
    assert(e.getMessage.contains("removed"))
    // restoring a vacuumed version fails loud
    ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0)
    val g = intercept[IllegalStateException] {
      ManifestTable.restore(spark, root, version = 1)
    }
    assert(g.getMessage.toLowerCase.contains("vacuum"))
  }

  test("readAsOf resolves timestamps to the version a reader then would have seen") {
    val root = freshRoot()
    ManifestTable.append(spark, root, spark.range(10).toDF("id"))
    Thread.sleep(50) // commit mtimes need to be distinguishable (ms granularity)
    ManifestTable.append(spark, root, spark.range(10, 30).toDF("id"))
    Thread.sleep(50)
    ManifestTable.append(spark, root, spark.range(30, 60).toDF("id"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    def mtime(v: Long) = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      f"$root/_manifests/v$v%020d.manifest")).getModificationTime
    // exactly at a commit's time → that commit; between commits → the earlier one
    assert(ManifestTable.versionAsOf(spark, root, mtime(1)) == 1)
    assert(ManifestTable.readAsOf(spark, root, mtime(2)).count() == 30)
    assert(ManifestTable.versionAsOf(spark, root, (mtime(2) + mtime(3)) / 2) == 2)
    assert(ManifestTable.readAsOf(spark, root, System.currentTimeMillis() + 10000).count() == 60)
    // before the first commit → loud failure, not an empty frame
    val e = intercept[IllegalArgumentException] {
      ManifestTable.versionAsOf(spark, root, mtime(1) - 10000)
    }
    assert(e.getMessage.contains("predates"))
    // mtime regression (clock skew): backdate v2's manifest BELOW v1 — the
    // running-max adjustment must keep version order authoritative
    fs.setTimes(new org.apache.hadoop.fs.Path(f"$root/_manifests/v${2L}%020d.manifest"),
      mtime(1) - 5000, -1)
    assert(ManifestTable.versionAsOf(spark, root, mtime(1)) == 2,
      "monotonized commit time of v2 should collapse onto v1's")
  }

  test("z-order compaction: same rows, dataChange:false, measurably tighter file bounding boxes") {
    val root = freshRoot()
    import spark.implicits._
    // two interleaved keys, appended in an order that correlates with
    // NEITHER (shuffled), so plain compaction leaves wide per-file ranges
    val rows = spark.range(150000).select(
      (col("id") * 7919 % 1000).as("ka"), (col("id") * 104729 % 1000).as("kb"),
      col("id").as("payload"),
      // incompressible ballast so the size-targeted rewrite yields >1 file
      org.apache.spark.sql.functions.md5(col("id").cast("string")).as("pad"))
    ManifestTable.append(spark, root, rows.repartition(16))
    val preVersion = ManifestTable.currentVersion(spark, root).get
    val v = ManifestTable.compact(spark, root, targetFileMb = 1, zorderBy = Seq("ka", "kb"))
    assert(v == preVersion + 1)
    val post = ManifestTable.read(spark, root)
    assert(post.count() == 150000)
    val fsum = (c: org.apache.spark.sql.Column) => org.apache.spark.sql.functions.sum(c)
    assert(post.select(fsum(col("ka") + col("kb") + col("payload"))).head().getLong(0) ==
      rows.select(fsum(col("ka") + col("kb") + col("payload"))).head().getLong(0))
    // compaction is invisible to incremental readers
    assert(ManifestTable.changesBetween(spark, root, preVersion, v).count() == 0)
    // data-skipping payoff: total bounding-box area over files shrinks vs
    // the pre-compaction layout (tighter min/max on BOTH keys)
    def area(files: Seq[String]): Double = files.map { f =>
      val r = spark.read.parquet(f).agg(
        org.apache.spark.sql.functions.min("ka"), org.apache.spark.sql.functions.max("ka"),
        org.apache.spark.sql.functions.min("kb"), org.apache.spark.sql.functions.max("kb")).head()
      (r.getLong(1) - r.getLong(0)).toDouble * (r.getLong(3) - r.getLong(2)).toDouble
    }.foldLeft(0.0)(_ + _)
    val preArea = area(ManifestTable.read(spark, root, Some(preVersion)).inputFiles.toSeq)
    val postFiles = post.inputFiles.toSeq
    assert(postFiles.length > 1, "need multiple output files to measure clustering")
    assert(area(postFiles) < preArea * 0.5,
      s"z-order compaction should at least halve total bounding-box area " +
        s"(pre=$preArea post=${area(postFiles)})")
    // guard: z keys overlapping the partition layout are refused
    val root2 = freshRoot()
    ManifestTable.append(spark, root2,
      Seq((1L, "a"), (2L, "b")).toDF("k", "part"), partitionBy = Seq("part"))
    val g = intercept[IllegalArgumentException] {
      ManifestTable.compact(spark, root2, zorderBy = Seq("k", "part"))
    }
    assert(g.getMessage.contains("partition layout"))
  }

  test("z-order compaction of a hive-partitioned table compacts (no file-count explosion)") {
    val root = freshRoot()
    import org.apache.spark.sql.functions.{col, md5}
    // 4 partition values × 16 input tasks = fragmented layout; z-values
    // are uncorrelated with the partition column
    val rows = spark.range(120000).select(
      (col("id") % 4).cast("string").as("day"),
      (col("id") * 7919 % 1000).as("ka"), (col("id") * 104729 % 1000).as("kb"),
      md5(col("id").cast("string")).as("pad"))
    ManifestTable.append(spark, root, rows.repartition(16), partitionBy = Seq("day"))
    val preFiles = ManifestTable.read(spark, root).inputFiles.length
    ManifestTable.compact(spark, root, targetFileMb = 1, zorderBy = Seq("ka", "kb"))
    val post = ManifestTable.read(spark, root)
    assert(post.count() == 120000)
    // ranging on (day, __zval) keeps each partition value on a contiguous
    // task run — the writer emits ~one file per task∩value: at most
    // nFiles (≈5 for this ~5 MB frame at 1 MB target) + one boundary
    // overlap per extra value (3). Ranging on __zval alone scatters every
    // value over every task → ~nFiles × |values| ≈ 20 files, which this
    // bound (measured fixed layout: 7) rejects.
    assert(post.inputFiles.length <= 12,
      s"expected ~nFiles+|values| files, got ${post.inputFiles.length} from $preFiles")
    assert(post.inputFiles.forall(_.contains("/day=")), "hive layout must survive")
  }
}
