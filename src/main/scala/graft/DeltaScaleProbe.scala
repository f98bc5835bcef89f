package graft

import graft.sources.{DeltaFileIndex, DeltaLake}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Foreign-Delta snapshot scale probe: driver cost of resolving and
  * pruning a CHECKPOINTED Delta snapshot as the add count grows — the
  * scale path a user pointing graft at a large existing lake hits first
  * (the reference's silver IS Delta, load_data_task.py:141-145).
  *
  * Method: synthesize a protocol-conformant classic checkpoint
  * (`<v>.checkpoint.parquet`: one protocol row, one metaData row, N add
  * rows with real per-file stats JSON, written BY Spark, distributed)
  * and measure, per N:
  *
  *   - eager `snapshot()` — every add materialized on the driver (the
  *     pre-r11 only path, and still the DV/mapping fallback);
  *   - `lazySnapshot()` resolve — metadata only, adds stay columnar;
  *   - the unfiltered lazy listing (stats payload elided);
  *   - a point-predicate `listFiles` through [[DeltaFileIndex]]'s
  *     DISTRIBUTED prune — executors evaluate the may-contain condition
  *     over the checkpoint rows, the driver collects survivors only.
  *
  * Data files named by the adds never exist: the lazy path synthesizes
  * `FileStatus` from the log's size/modificationTime, so `listFiles`
  * completing without touching the filesystem is itself part of the
  * proof. Writes the "## Foreign Delta snapshot scale" SCALE.md section
  * (spliced; other probes' sections preserved).
  */
object DeltaScaleProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-delta-scale", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType), StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType), nullable = true),
      StructField("writerFeatures", ArrayType(StringType), nullable = true)))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val tableSchema = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType)))

    def buildTable(n: Long): String = {
      val root = java.nio.file.Files.createTempDirectory("deltascale").toString + "/t"
      val logDir = new java.io.File(s"$root/_delta_log")
      logDir.mkdirs()
      val addT = StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType, valueContainsNull = true)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType, nullable = true)))
      val addRows = spark.range(n).select(
        struct(
          format_string("data/part-%09d.parquet", col("id")).as("path"),
          map().cast(MapType(StringType, StringType, valueContainsNull = true))
            .as("partitionValues"),
          lit(1L << 20).as("size"),
          lit(1700000000000L).as("modificationTime"),
          lit(true).as("dataChange"),
          format_string(
            "{\"numRecords\":100,\"minValues\":{\"id\":%d},\"maxValues\":{\"id\":%d}," +
              "\"nullCount\":{\"id\":0}}",
            col("id") * 100, col("id") * 100 + 99).as("stats")
        ).as("add"),
        lit(null).cast(metaT).as("metaData"),
        lit(null).cast(protocolT).as("protocol"))
      val headRows = spark.range(2).select(
        lit(null).cast(addT).as("add"),
        when(col("id") === 0, struct(
          lit(java.util.UUID.randomUUID().toString).as("id"),
          struct(lit("parquet").as("provider")).as("format"),
          lit(tableSchema.json).as("schemaString"),
          array().cast(ArrayType(StringType)).as("partitionColumns"),
          map().cast(MapType(StringType, StringType)).as("configuration"),
          lit(0L).as("createdTime"))).as("metaData"),
        when(col("id") === 1, struct(
          lit(1).as("minReaderVersion"), lit(2).as("minWriterVersion"),
          lit(null).cast(ArrayType(StringType)).as("readerFeatures"),
          lit(null).cast(ArrayType(StringType)).as("writerFeatures"))).as("protocol"))
      val tmp = java.nio.file.Files.createTempDirectory("cp").toString
      // small row groups: a real 1M-add checkpoint is hundreds of MB with
      // many row groups, which is what lets executors split the scan —
      // a single-row-group toy file would serialize the prune to 1 task
      headRows.unionByName(addRows).coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (1 << 20).toString).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(logDir, f"${0L}%020d.checkpoint.parquet").toPath)
      root
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val sizes = args.toSeq match {
      case Nil => Seq(10_000L, 100_000L, 1_000_000L)
      case xs => xs.map(_.toLong)
    }
    val results = sizes.map { n =>
      val root = buildTable(n)
      val cpMb = new java.io.File(s"$root/_delta_log")
        .listFiles().map(_.length()).sum / 1e6
      val (eagerSnap, tEager) = time(DeltaLake.snapshot(spark, root))
      require(eagerSnap.files.size == n, s"eager lost adds: ${eagerSnap.files.size} of $n")
      val (resolved, tResolve) = time(DeltaLake.lazySnapshot(spark, root))
      val ls = resolved.getOrElse(sys.error("checkpointed snapshot must resolve lazily"))
      val (allAdds, tList) = time(DeltaLake.pruneCheckpointAdds(spark, ls, None))
      require(allAdds.size == n, s"lazy listing lost adds: ${allAdds.size} of $n")
      val mid = (n / 2) * 100 + 7
      val idx = new DeltaFileIndex(spark, root, ls)
      val pred = org.apache.spark.sql.catalyst.expressions.EqualTo(
        org.apache.spark.sql.catalyst.expressions.AttributeReference("id", LongType)(),
        org.apache.spark.sql.catalyst.expressions.Literal(mid))
      val (dirs, tPrune) = time(idx.listFiles(Nil, Seq(pred)))
      val survivors = dirs.map(_.files.length).sum
      require(survivors == 1, s"expected 1 surviving file, got $survivors")
      // r13: the checkpoint WRITE direction — writeCheckpointV2 streams
      // adds through parquet-hadoop (O(row-group) memory; sizes come
      // from the log's own add actions, zero per-file stats). r14: the
      // PAYLOAD side streams too — adds iterate DRIVER-DIRECT off the
      // previous checkpoint's own parquet (per-file projection, one row
      // group at a time, zero Spark jobs) merged with the JSON tail,
      // never materializing the AddEntry list, so the live peak must
      // now be FLAT in N (the r12 Seq[Row]+LocalRelation shape held 2-3
      // add copies; r13 still held the eager snapshot's full AddEntry
      // list — 2.7 GB at 1M adds).
      def usedHeap(): Long = {
        val rt = Runtime.getRuntime; rt.totalMemory - rt.freeMemory
      }
      System.gc(); Thread.sleep(200)
      val base = usedHeap()
      // GC-VERIFIED live-heap sampler (r14): a raw used-heap sample on a
      // 64g JVM mostly measures eden garbage (minor GC may not fire once
      // during the whole write), which made the r13 column read as
      // retained memory when it wasn't. When a sample exceeds the last
      // verified peak by 128MB the sampler forces a collection and
      // records the LIVE size — the number that must fit a production
      // driver. The write is timed in its own untouched pass first.
      val (cpV, tCpV2) = time(DeltaLake.writeCheckpointV2(spark, root, sidecarParts = 4))
      require(cpV == 1L, s"v2 checkpoint expected at upgraded version 1, got $cpV")
      @volatile var peak = 0L
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          // UNCONDITIONAL periodic verify: collect, then read live.
          // Threshold-triggered sampling would floor-censor (a true
          // live peak under the trigger reads 0) and an unthrottled
          // verify fires once per ~128MB of ALLOCATION on a big heap —
          // a full collection every ~0.1s of work, 10-20x write
          // slowdown (measured). One live reading every ~1.5s bounds
          // the pause tax while sampling a 30s+ write many times over;
          // the timed pass runs separately, untouched.
          System.gc()
          peak = math.max(peak, usedHeap() - base)
          Thread.sleep(1500)
        }
      })
      sampler.setDaemon(true); sampler.start()
      // idempotent re-write of the same version: same payload path,
      // measured for live heap only (seconds column = the clean pass)
      DeltaLake.writeCheckpointV2(spark, root, sidecarParts = 4)
      sampling = false; sampler.join()
      val peakMb = math.max(0L, peak) / 1e6
      require(DeltaLake.snapshot(spark, root).files.size == n,
        "replay from the streamed v2 checkpoint must keep every add")
      println(f"| $n%,d | $cpMb%.1f | $tEager%.2f | $tResolve%.2f | $tList%.2f | $tPrune%.2f | $tCpV2%.2f | $peakMb%.0f |")
      (n, cpMb, tEager, tResolve, tList, tPrune, tCpV2, peakMb)
    }

    val rows = results.map { case (n, mb, e, r, l, p, w, h) =>
      f"| $n%,d | $mb%.1f | $e%.2f | $r%.2f | $l%.2f | $p%.2f | $w%.2f | $h%.0f |"
    }.mkString("\n")
    val section =
      s"""## Foreign Delta snapshot scale
         |
         |Generated by `sbt "runMain graft.DeltaScaleProbe"`: resolving and
         |pruning a synthetic but protocol-conformant CHECKPOINTED Delta table
         |(classic single-file checkpoint; N adds with real per-file stats
         |JSON) as N grows. `eager` = `DeltaLake.snapshot` materializing every
         |add on the driver (the pre-r11 only path; still the DV / column-
         |mapping fallback). `resolve` = `lazySnapshot` (metadata + JSON tail
         |only). `full list` = the unfiltered lazy listing (paths/sizes
         |collected, stats payload elided). `point-prune` = a pushed `id = k`
         |equality through `DeltaFileIndex.listFiles`: executors evaluate the
         |may-contain condition over the checkpoint's own parquet rows and
         |exactly ONE file row reaches the driver, its `FileStatus`
         |synthesized from the log's size/modificationTime (the adds' data
         |files don't even exist — zero filesystem RPCs on the pruned path).
         |`v2cp write` + `write live MB` (r13, re-shaped r14) =
         |`writeCheckpointV2` over the same N adds: the payload now STREAMS
         |end to end — each add iterates DRIVER-DIRECT off the previous
         |checkpoint's own parquet through parquet-hadoop with a per-file
         |add-column projection (one row group in memory at a time, zero
         |Spark jobs), merges with the driver-resident JSON tail, and lands
         |in the output writer's current row group; the AddEntry list is
         |never materialized (r13 still eager-snapshotted it: 2,765 MB peak
         |at 1M adds; r12 additionally built a `Seq[Row]` + LocalRelation
         |copy). Sizes come from the log's own add actions — zero per-file
         |stat RPCs. The seconds column is a clean untouched pass; the live
         |column is a GC-VERIFIED peak from an idempotent re-write of the
         |same version: the sampler collects and reads LIVE size every
         |~1.5s (a raw used-heap sample on a 64g JVM mostly measures eden
         |garbage; a threshold-triggered verify would floor-censor true
         |peaks under its trigger) — the number that must fit a
         |production driver, at ~1.5s granularity.
         |The write also publishes the spec-required `v2Checkpoint`
         |protocol upgrade first. DV-carrying and column-mapped lakes
         |stream too when the log declares the features (r14 — add rows
         |and DV descriptors copy verbatim); only NONCONFORMANT logs
         |(undeclared features, which need the eager path's protocol
         |promotion) and pure-JSON logs (driver-bounded by the log
         |itself) keep the eager payload.
         |
         || adds | checkpoint MB | eager s | resolve s | full list s | point-prune s | v2cp write s | write live MB |
         ||---|---|---|---|---|---|---|---|
         |@@ROWS@@
         |
         |Reading: `resolve`, `point-prune`, AND `write peak` are flat in N
         |on the driver — O(metadata), O(survivors), and O(split + row-group)
         |heap respectively — while `eager` grows linearly in both time and
         |retained AddEntry heap (at 1M adds the eager path holds every path
         |+ partition map + stats string). A filtered read of a 1M-file
         |foreign lake touches the driver with ONE surviving row instead of
         |1M materialized adds; an unfiltered read still lists all N (the
         |FileIndex contract) but without the stats payload, the dominant
         |per-add weight. The point-prune's seconds are a fixed small Spark
         |job (scan + filter + collect) — the same shape at any N the
         |checkpoint reaches, which is the property that holds at 100 TB.
         |Re-checkpointing a table whose state rests on a checkpoint is now
         |O(row-group) driver memory end to end — the last measured
         |O(N)-driver path the r13 verdict flagged is closed for every
         |conformant log shape, DV'd and column-mapped included; only
         |nonconformant logs (undeclared features) and pure-JSON logs
         |(driver-bounded by the log itself) keep the eager payload.
         |""".stripMargin.replace("@@ROWS@@", rows)
    println(section)
    val f = new java.io.File("SCALE.md")
    if (f.exists()) {
      val prev = scala.io.Source.fromFile(f, "UTF-8").mkString
      val start = prev.indexOf("## Foreign Delta snapshot scale")
      val baseDoc =
        if (start < 0) prev
        else {
          val next = prev.indexOf("\n## ", start + 1)
          if (next < 0) prev.substring(0, start) else prev.substring(0, start) + prev.substring(next + 1)
        }
      val outW = new java.io.PrintWriter(f, "UTF-8")
      try outW.print(baseDoc.stripSuffix("\n") + "\n\n" + section) finally outW.close()
      println("updated SCALE.md foreign-delta section")
    } else println("SCALE.md absent — printed only")
    spark.stop()
  }
}
