package graft

import graft.sources.{IcebergFileIndex, IcebergTable}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types.LongType

/** Foreign-Iceberg snapshot scale probe — the Avro-manifest twin of
  * [[DeltaScaleProbe]]: driver cost of resolving and pruning a big
  * Iceberg snapshot as the file count grows.
  *
  * Method: author a spec-conformant v2 table DIRECTLY (metadata JSON,
  * manifest-list Avro, M data manifests × K entries each with real
  * Appendix-D `id` bounds — the public format, no reader/writer code
  * shared), data files never materialized (the lazy path never stats
  * them — FileStatuses synthesize from `file_size_in_bytes`). Per N:
  *
  *   - eager `snapshot()` — every entry materialized on the driver
  *     (bounds maps included: the per-entry weight);
  *   - `lazySnapshot()` resolve — metadata + manifest list only;
  *   - the unfiltered lazy listing (stats elided);
  *   - a point-predicate `listFiles` through the DISTRIBUTED prune —
  *     one task per manifest group, survivors only to the driver.
  *
  * Writes the "## Foreign Iceberg snapshot scale" SCALE.md section. */
object IcebergScaleProbe extends Serializable {

  private val EntrySchemaJson =
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"content","type":"int","field-id":134},
      |    {"name":"file_path","type":"string","field-id":100},
      |    {"name":"file_format","type":"string","field-id":101},
      |    {"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
      |    {"name":"record_count","type":"long","field-id":103},
      |    {"name":"file_size_in_bytes","type":"long","field-id":104},
      |    {"name":"lower_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k126_v127","fields":[
      |      {"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]},"logicalType":"map"}],"default":null,"field-id":125},
      |    {"name":"upper_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k129_v130","fields":[
      |      {"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]},"logicalType":"map"}],"default":null,"field-id":128}
      |  ]},"field-id":2}
      |]}""".stripMargin

  private val ListSchemaJson =
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string","field-id":500},
      |  {"name":"manifest_length","type":"long","field-id":501},
      |  {"name":"partition_spec_id","type":"int","field-id":502},
      |  {"name":"content","type":"int","field-id":517},
      |  {"name":"sequence_number","type":"long","field-id":515},
      |  {"name":"min_sequence_number","type":"long","field-id":516},
      |  {"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-iceberg-scale", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def leBytes(v: Long): java.nio.ByteBuffer =
      java.nio.ByteBuffer.wrap(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array())

    /** Write manifest `m` holding entries [m*per, m*per+per). */
    def writeManifest(metaDir: String, m: Int, per: Long): String = {
      val schema = new Schema.Parser().parse(EntrySchemaJson)
      val dfSchema = schema.getField("data_file").schema()
      val kvSchema = dfSchema.getField("lower_bounds").schema().getTypes.get(1)
      val path = s"$metaDir/m$m.avro"
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(path))
      try {
        var i = m * per
        val hi = m * per + per
        while (i < hi) {
          def kv(key: Int, v: Long): AnyRef = {
            val arr = new java.util.ArrayList[GenericRecord]()
            val item = kvSchema.getElementType
            val r = new GenericData.Record(item)
            r.put("key", key); r.put("value", leBytes(v)); arr.add(r)
            arr
          }
          val df = new GenericData.Record(dfSchema)
          df.put("content", 0)
          df.put("file_path", f"data/part-$i%09d.parquet")
          df.put("file_format", "PARQUET")
          df.put("partition", new GenericData.Record(dfSchema.getField("partition").schema()))
          df.put("record_count", 100L)
          df.put("file_size_in_bytes", 1L << 20)
          df.put("lower_bounds", kv(1, i * 100L))
          df.put("upper_bounds", kv(1, i * 100L + 99L))
          val e = new GenericData.Record(schema)
          e.put("status", 1)
          e.put("snapshot_id", 1L)
          e.put("sequence_number", 1L)
          e.put("data_file", df)
          w.append(e)
          i += 1
        }
      } finally w.close()
      path
    }

    /** Delete-entry manifest schema: the data-file record plus
      * `equality_ids` (spec field-id 135). */
    val DeleteEntrySchemaJson = EntrySchemaJson.replace(
      """{"name":"file_size_in_bytes","type":"long","field-id":104},""",
      """{"name":"file_size_in_bytes","type":"long","field-id":104},
        |    {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},""".stripMargin)

    /** One equality-delete manifest (one REAL parquet delete file naming
      * `id = 42`, applying to every data file: delete seq 2 > data seq
      * 1) — plus the ONE real sample data parquet the composed read's
      * footer probe opens. Everything else still never exists. */
    def addDeleteSide(root: String, metaDir: String): String = {
      val tmp = s"$root/.stage-del"
      spark.range(1).selectExpr("CAST(42 AS LONG) AS id").coalesce(1).write.parquet(tmp)
      val delDir = new java.io.File(s"$root/deletes"); delDir.mkdirs()
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      val delFile = new java.io.File(delDir, "del-0.parquet")
      require(part.renameTo(delFile))
      new java.io.File(tmp).listFiles().foreach(_.delete()); new java.io.File(tmp).delete()
      val sampleTmp = s"$root/.stage-sample"
      spark.range(1).selectExpr("CAST(0 AS LONG) AS id", "CAST(0.0 AS DOUBLE) AS v")
        .coalesce(1).write.parquet(sampleTmp)
      val dataDir = new java.io.File(s"$root/data"); dataDir.mkdirs()
      val sPart = new java.io.File(sampleTmp).listFiles().find(_.getName.endsWith(".parquet")).get
      require(sPart.renameTo(new java.io.File(dataDir, "part-000000000.parquet")))
      new java.io.File(sampleTmp).listFiles().foreach(_.delete()); new java.io.File(sampleTmp).delete()
      val schema = new Schema.Parser().parse(DeleteEntrySchemaJson)
      val dfSchema = schema.getField("data_file").schema()
      val path = s"$metaDir/d0.avro"
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(path))
      try {
        val df = new GenericData.Record(dfSchema)
        df.put("content", 2)
        df.put("file_path", "deletes/del-0.parquet")
        df.put("file_format", "PARQUET")
        df.put("partition", new GenericData.Record(dfSchema.getField("partition").schema()))
        df.put("record_count", 1L)
        df.put("file_size_in_bytes", delFile.length())
        val ids = new java.util.ArrayList[Integer](); ids.add(1)
        df.put("equality_ids", ids)
        val e = new GenericData.Record(schema)
        e.put("status", 1)
        e.put("snapshot_id", 1L)
        e.put("sequence_number", 2L)
        e.put("data_file", df)
        w.append(e)
      } finally w.close()
      path
    }

    def buildTable(n: Long, manifests: Int, withDelete: Boolean = false): String = {
      val root = java.nio.file.Files.createTempDirectory("icescale").toString + "/t"
      val metaDir = s"$root/metadata"
      new java.io.File(metaDir).mkdirs()
      val per = n / manifests
      // manifests authored IN PARALLEL (local threads via one Spark job)
      val paths = spark.sparkContext
        .parallelize(0 until manifests, manifests)
        .map(m => writeManifest(metaDir, m, per)).collect().sorted
      val delManifest = if (withDelete) Some(addDeleteSide(root, metaDir)) else None
      val listSchema = new Schema.Parser().parse(ListSchemaJson)
      val listPath = s"$metaDir/snap-1.avro"
      val lw = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](listSchema))
      lw.create(listSchema, new java.io.File(listPath))
      try {
        paths.foreach { p =>
          val r = new GenericData.Record(listSchema)
          r.put("manifest_path", p)
          r.put("manifest_length", new java.io.File(p).length())
          r.put("partition_spec_id", 0)
          r.put("content", 0)
          r.put("sequence_number", 1L)
          r.put("min_sequence_number", 1L)
          r.put("added_snapshot_id", 1L)
          lw.append(r)
        }
        delManifest.foreach { p =>
          val r = new GenericData.Record(listSchema)
          r.put("manifest_path", p)
          r.put("manifest_length", new java.io.File(p).length())
          r.put("partition_spec_id", 0)
          r.put("content", 1)
          r.put("sequence_number", 2L)
          r.put("min_sequence_number", 2L)
          r.put("added_snapshot_id", 1L)
          lw.append(r)
        }
      } finally lw.close()
      val json =
        s"""{
           |  "format-version": 2, "table-uuid": "00000000-0000-0000-0000-000000000001",
           |  "location": "$root", "last-sequence-number": 1,
           |  "last-updated-ms": 1700000000000, "last-column-id": 2,
           |  "current-schema-id": 0,
           |  "schemas": [{"type":"struct","schema-id":0,"fields":[
           |    {"id":1,"name":"id","required":false,"type":"long"},
           |    {"id":2,"name":"v","required":false,"type":"double"}]}],
           |  "default-spec-id": 0, "partition-specs": [{"spec-id":0,"fields":[]}],
           |  "last-partition-id": 999, "default-sort-order-id": 0,
           |  "sort-orders": [{"order-id":0,"fields":[]}], "properties": {},
           |  "current-snapshot-id": 1,
           |  "snapshots": [{"snapshot-id":1,"sequence-number":1,"timestamp-ms":1700000000000,
           |    "summary":{"operation":"append"},"manifest-list":"$listPath","schema-id":0}],
           |  "snapshot-log": [{"timestamp-ms":1700000000000,"snapshot-id":1}],
           |  "metadata-log": []
           |}""".stripMargin
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(metaDir, "v1.metadata.json"), json)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(metaDir, "version-hint.text"), "1")
      root
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val sizes = args.toSeq match {
      case Nil => Seq(10_000L, 100_000L, 1_000_000L)
      case xs => xs.map(_.toLong)
    }
    val results = sizes.map { n0 =>
      val manifests = math.max(1, (n0 / 15625L).toInt) // ~15.6k entries each
      val n = (n0 / manifests) * manifests // whole manifests only
      val root = buildTable(n, manifests)
      val mb = new java.io.File(s"$root/metadata").listFiles()
        .filter(_.getName.startsWith("m")).map(_.length()).sum / 1e6
      val (eager, tEager) = time(IcebergTable.snapshot(spark, root))
      require(eager.dataFiles.size == n, s"eager lost entries: ${eager.dataFiles.size} of $n")
      val (ls, tResolve) = time(IcebergTable.lazySnapshot(spark, root))
      require(ls.dataManifests.size == manifests)
      val (all, tList) = time(IcebergTable.pruneDataManifests(spark, ls, Nil, withStats = false))
      require(all.size == n, s"lazy listing lost entries: ${all.size} of $n")
      val mid = (n / 2) * 100 + 7
      val idx = new IcebergFileIndex(spark, root, ls, new org.apache.spark.sql.types.StructType())
      val pred = org.apache.spark.sql.catalyst.expressions.EqualTo(
        org.apache.spark.sql.catalyst.expressions.AttributeReference("id", LongType)(),
        org.apache.spark.sql.catalyst.expressions.Literal(mid))
      val (dirs, tPrune) = time(idx.listFiles(Nil, Seq(pred)))
      val survivors = dirs.map(_.files.length).sum
      require(survivors == 1, s"expected 1 surviving file, got $survivors")
      // r12: the DELETE-CARRYING composed read — resolve + delete-file
      // read + plan build, with the data manifests still unread on the
      // driver (the pre-r12 path materialized every entry here)
      val rootD = buildTable(n, manifests, withDelete = true)
      val (delDf, tDelPlan) = time(IcebergTable.read(spark, rootD))
      require(delDf.columns.toSeq == Seq("id", "v"),
        s"delete-carrying read produced schema ${delDf.columns.toSeq}")
      // r19: add_files registration against n live entries — the
      // duplicate guard is batch-bounded on the driver (distributed
      // manifest probe), so registration time must not track the
      // table. First call resumes the FOREIGN minimal list (one-time
      // count recompute, documented O(live)); second call resumes
      // graft's own count-carrying list — the steady state.
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      val regSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", DoubleType)))
      def freshBatch(tag: String): Seq[String] = {
        val dir = s"$rootD-batch-$tag"
        spark.range(2).selectExpr("id", "CAST(id AS DOUBLE) AS v")
          .repartition(2).write.parquet(dir)
        new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath).toSeq
      }
      graft.sources.IcebergWriter.forgetState(root)
      val (_, tReg1) = time(
        graft.sources.IcebergWriter.addFiles(spark, root, regSchema, freshBatch("a")))
      graft.sources.IcebergWriter.forgetState(root)
      val (_, tReg2) = time(
        graft.sources.IcebergWriter.addFiles(spark, root, regSchema, freshBatch("b")))
      println(f"| $n%,d | $manifests | $mb%.1f | $tEager%.2f | $tResolve%.2f | $tList%.2f | $tPrune%.2f | $tDelPlan%.2f | $tReg1%.2f | $tReg2%.2f |")
      (n, manifests, mb, tEager, tResolve, tList, tPrune, tDelPlan, tReg1, tReg2)
    }

    val rows = results.map { case (n, m, mb, e, r, l, p, d, g1, g2) =>
      f"| $n%,d | $m | $mb%.1f | $e%.2f | $r%.2f | $l%.2f | $p%.2f | $d%.2f | $g1%.2f | $g2%.2f |"
    }.mkString("\n")
    val section =
      s"""## Foreign Iceberg snapshot scale
         |
         |Generated by `sbt "runMain graft.IcebergScaleProbe"`: resolving and
         |pruning a spec-conformant v2 table authored directly by the probe
         |(metadata JSON + manifest-list Avro + M data manifests × ~15.6k
         |entries with real Appendix-D `id` bounds; data files never exist —
         |the lazy path synthesizes FileStatus from `file_size_in_bytes`).
         |`eager` = `IcebergTable.snapshot` materializing every entry (bounds
         |maps included) on the driver — the pre-r11 only path, and through
         |r11 also what every delete-carrying read paid. `resolve` =
         |`lazySnapshot` (metadata + manifest list + delete manifests only).
         |`full list` = the unfiltered lazy listing, stats elided.
         |`point-prune` = a pushed `id = k` equality through
         |`IcebergFileIndex.listFiles`: EXECUTORS parse the manifests (one
         |task per manifest group, Avro core) and evaluate the same
         |`IcebergEntryPruner` the driver index uses; exactly ONE entry
         |reaches the driver. `delete-plan` (r12) = the full composed
         |`IcebergTable.read` PLAN BUILD over the same table carrying one
         |equality-delete file — resolve, delete parquet read,
         |`__seq`-interval wiring — with the data manifests still unread on
         |the driver. `addfiles-adopt` / `addfiles-steady` (r19) = a
         |2-file `add_files` registration INTO the table at this size,
         |fresh-session resume each time: the duplicate guard probes the
         |live set DISTRIBUTED (one task per manifest, only batch
         |collisions and per-manifest counts return), so the driver cost
         |is bounded by the batch. The adopt column additionally pays the
         |ONE-TIME count recompute a foreign minimal manifest list forces
         |at resume (absent `added_files_count` — recounted rather than
         |republished as 0); the steady column resumes graft's own
         |count-carrying list — the verb's accreting-directory regime.
         |
         || entries | manifests | manifest MB | eager s | resolve s | full list s | point-prune s | delete-plan s | addfiles-adopt s | addfiles-steady s |
         ||---|---|---|---|---|---|---|---|---|---|
         |@@ROWS@@
         |
         |Reading: `resolve` is flat (metadata-scale) and `point-prune` grows
         |only with manifest COUNT / available cores (the per-manifest Avro
         |decode is the unit of work — on a real cluster that term spreads
         |over executors), while `eager` pays the full driver materialization:
         |every path string, partition map, and bounds byte-array on one
         |heap. A filtered read of a million-file foreign Iceberg table now
         |touches the driver with survivors only — the same bound the native
         |format (`checkpointPrune`) and the Delta face (`lazySnapshot`) got.
         |`delete-plan` is flat too (r12, near the one-manifest sample parse
         |the footer probe pays): equality deletes apply through the
         |synthetic `__seq` partition column the scan serves from each
         |manifest entry, so delete grouping needs only the DELETE files'
         |sequence numbers — the last driver-bound foreign-lake load
         |(delete-carrying snapshots) is closed. Execution-time pruning stays
         |on executors: `IcebergEntryPruner` treats `__seq` as an exact
         |per-file bound, so each interval branch lists only its own files
         |(IcebergSpec pins each data file listed exactly once across
         |branches).
         |""".stripMargin.replace("@@ROWS@@", rows)
    println(section)
    val f = new java.io.File("SCALE.md")
    if (f.exists()) {
      val prev = scala.io.Source.fromFile(f, "UTF-8").mkString
      val start = prev.indexOf("## Foreign Iceberg snapshot scale")
      val baseDoc =
        if (start < 0) prev
        else {
          val next = prev.indexOf("\n## ", start + 1)
          if (next < 0) prev.substring(0, start) else prev.substring(0, start) + prev.substring(next + 1)
        }
      val outW = new java.io.PrintWriter(f, "UTF-8")
      try outW.print(baseDoc.stripSuffix("\n") + "\n\n" + section) finally outW.close()
      println("updated SCALE.md foreign-iceberg section")
    } else println("SCALE.md absent — printed only")
    spark.stop()
  }
}
