package graft

import graft.sources.{IcebergTable, IcebergWriter}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector.{BytesColumnVector, LongColumnVector, TimestampColumnVector}
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ORC data-file read leg (r15): hand-built spec-conformant tables —
  * metadata JSON + Avro manifests + ORC DATA files carrying
  * `iceberg.id` type attributes — pinning the Hive-heritage shape, not
  * a round trip through graft's own (parquet-only) writer. */
class IcebergOrcSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("iceorc").toString + "/t"

  /** The table's ORC schema over (id long, label string,
    * ts timestamptz) with the given NAMES but fixed iceberg.id
    * attributes 1/2/3 — renamed files must still resolve by id. */
  private def orcSchema(idName: String, labelName: String, tsName: String): TypeDescription =
    TypeDescription.createStruct()
      .addField(idName, TypeDescription.createLong().setAttribute("iceberg.id", "1"))
      .addField(labelName, TypeDescription.createString().setAttribute("iceberg.id", "2"))
      .addField(tsName, TypeDescription.createTimestampInstant().setAttribute("iceberg.id", "3"))

  /** rows = (id, label-or-null, epoch micros). useUTCTimestamp on the
    * writer mirrors the read leg (and Iceberg's own ORC convention). */
  private def writeOrc(path: String, sch: TypeDescription,
      rows: Seq[(Long, String, Long)]): Unit = {
    new java.io.File(path).getParentFile.mkdirs()
    val w = OrcFile.createWriter(new Path(path),
      OrcFile.writerOptions(new Configuration()).setSchema(sch).useUTCTimestamp(true))
    val batch = sch.createRowBatch()
    rows.foreach { case (id, label, us) =>
      val i = batch.size
      batch.cols(0).asInstanceOf[LongColumnVector].vector(i) = id
      val lv = batch.cols(1).asInstanceOf[BytesColumnVector]
      if (label == null) { lv.noNulls = false; lv.isNull(i) = true }
      else { val b = label.getBytes("UTF-8"); lv.setRef(i, b, 0, b.length) }
      val tv = batch.cols(2).asInstanceOf[TimestampColumnVector]
      tv.time(i) = Math.floorDiv(us, 1000L)
      tv.nanos(i) = (Math.floorMod(us, 1000000L) * 1000L).toInt
      batch.size += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
  }

  private val usBase = 1_700_000_000_000_000L // 2023-11-14T22:13:20Z in micros

  test("an all-ORC table reads through IcebergTable.read (lazy path routes to the eager leg)") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = orcSchema("id", "label", "ts")
    writeOrc(s"$root/data/o0.orc", s, (0L until 40L).map(i => (i, s"n$i", usBase + i)))
    writeOrc(s"$root/data/o1.orc", s, (40L until 100L).map(i => (i, s"n$i", usBase + i)))
    IcebergHandBuilt.publish(root,
      Seq((s"$root/data/o0.orc", "ORC", 40L), (s"$root/data/o1.orc", "ORC", 60L)))
    val got = IcebergTable.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "label", "ts"))
    assert(got.count() === 100)
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 100L).sum)
    // timestamptz decodes as the instant, zone-proof (useUTCTimestamp)
    val t0 = got.filter(col("id") === 0L).select(col("ts")).head().getTimestamp(0)
    assert(t0.toInstant === java.time.Instant.ofEpochSecond(1_700_000_000L))
    // filters still work (applied post-read; file pruning happened upstream)
    assert(got.filter(col("id") >= 90L).count() === 10)
  }

  test("field-id resolution: a file written under OLD column names serves the renamed schema") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = orcSchema("id_v1", "old_label", "event_time")
    writeOrc(s"$root/data/o0.orc", s, Seq((7L, "seven", usBase)))
    IcebergHandBuilt.publish(root, Seq((s"$root/data/o0.orc", "ORC", 1L)))
    val got = IcebergTable.read(spark, root).collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === 7L && got(0).getString(1) === "seven",
      "values must bind by iceberg.id, not by the file's old names")
  }

  test("null slots decode as null (vectorized null mask honored)") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = orcSchema("id", "label", "ts")
    writeOrc(s"$root/data/o0.orc", s, Seq((1L, null, usBase), (2L, "b", usBase + 1)))
    IcebergHandBuilt.publish(root, Seq((s"$root/data/o0.orc", "ORC", 2L)))
    val got = IcebergTable.read(spark, root).orderBy("id").collect()
    assert(got(0).isNullAt(1) && got(1).getString(1) === "b")
  }

  test("a MIXED parquet+orc+avro snapshot unions all three legs (eager read)") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    // ORC third
    val s = orcSchema("id", "label", "ts")
    writeOrc(s"$root/data/o0.orc", s, (0L until 30L).map(i => (i, s"n$i", usBase + i)))
    // Avro third
    val as = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"t","fields":[
        |  {"name":"id","type":["null","long"],"default":null,"field-id":1},
        |  {"name":"label","type":["null","string"],"default":null,"field-id":2},
        |  {"name":"ts","type":["null",{"type":"long","logicalType":"timestamp-micros","adjust-to-utc":true}],"default":null,"field-id":3}
        |]}""".stripMargin)
    IcebergHandBuilt.writeAvro(s"$root/data/a0.avro", as, (30L until 60L).map { i =>
      val r = new org.apache.avro.generic.GenericData.Record(as)
      r.put("id", i); r.put("label", s"n$i"); r.put("ts", usBase + i)
      r
    })
    // parquet third goes through spark's writer with embedded field ids
    import spark.implicits._
    val pq = (60L until 100L).map(i =>
      (i, s"n$i", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1_700_000_000L)
        .plusNanos(i * 1000)))).toDF("id", "label", "ts")
    val idsSchema = IcebergWriter.withIds(pq.schema)
    val tmp = s"$root/.stage"
    spark.createDataFrame(pq.rdd, idsSchema).coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new java.io.File(s"$root/data/p0.parquet")
    dest.getParentFile.mkdirs(); assert(part.renameTo(dest))
    IcebergHandBuilt.publish(root, Seq(
      (s"$root/data/o0.orc", "ORC", 30L),
      (s"$root/data/a0.avro", "AVRO", 30L),
      (dest.getAbsolutePath, "PARQUET", 40L)))
    val got = IcebergTable.read(spark, root)
    assert(got.count() === 100)
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 100L).sum)
    assert(got.filter(col("id") === 15L).select("label").head().getString(0) === "n15")
    assert(got.filter(col("id") === 45L).select("label").head().getString(0) === "n45")
    assert(got.filter(col("id") === 75L).select("label").head().getString(0) === "n75")
  }

  test("a mixed snapshot sampled at a PARQUET entry still reads (r16: manifest order " +
    "must not decide whether a table reads)") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    // parquet FIRST in the manifest — the ordering that used to resolve
    // lazily and then throw at scan time
    import spark.implicits._
    val pq = (0L until 40L).map(i =>
      (i, s"n$i", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1_700_000_000L)
        .plusNanos(i * 1000)))).toDF("id", "label", "ts")
    val idsSchema = IcebergWriter.withIds(pq.schema)
    val tmp = s"$root/.stage"
    spark.createDataFrame(pq.rdd, idsSchema).coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new java.io.File(s"$root/data/p0.parquet")
    dest.getParentFile.mkdirs(); assert(part.renameTo(dest))
    val s = orcSchema("id", "label", "ts")
    writeOrc(s"$root/data/o0.orc", s, (40L until 100L).map(i => (i, s"n$i", usBase + i)))
    IcebergHandBuilt.publish(root, Seq(
      (dest.getAbsolutePath, "PARQUET", 40L),
      (s"$root/data/o0.orc", "ORC", 60L)))
    val got = IcebergTable.read(spark, root)
    assert(got.count() === 100)
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 100L).sum)
    assert(got.filter(col("id") === 5L).select("label").head().getString(0) === "n5")
    assert(got.filter(col("id") === 95L).select("label").head().getString(0) === "n95")
  }

  test("partial field-id coverage refuses loud naming the file (r16: no silent column loss)") {
    import org.apache.spark.sql.types._
    val cols = Seq(("id", Some(1), LongType: DataType), ("label", Some(2), StringType: DataType))
    // the file has TWO fields but declares an id on only one of them
    val e = intercept[IllegalArgumentException](
      graft.sources.IcebergForeignData.binding(
        cols, Map.empty, Map(1 -> 0), Map("id" -> 0, "label" -> 1), Map.empty,
        (v, _) => v, "/x/data/partial.orc"))
    assert(e.getMessage.contains("partial id coverage") &&
      e.getMessage.contains("/x/data/partial.orc"))
    // full coverage and zero coverage both still bind
    assert(graft.sources.IcebergForeignData.binding(cols, Map.empty,
      Map(1 -> 0, 2 -> 1), Map("id" -> 0, "label" -> 1), Map.empty, (v, _) => v,
      "/x/f.orc")(1) === Right(1))
    assert(graft.sources.IcebergForeignData.binding(cols, Map.empty,
      Map.empty, Map("id" -> 0, "label" -> 1), Map.empty, (v, _) => v,
      "/x/f.orc")(0) === Right(0))
  }

  test("the named fix is runnable: rewriteCompact turns a foreign ORC table into parquet, " +
    "after which v2 deletes apply") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = orcSchema("id", "label", "ts")
    writeOrc(s"$root/data/o0.orc", s, (0L until 50L).map(i => (i, s"n$i", usBase + i)))
    IcebergHandBuilt.publish(root, Seq((s"$root/data/o0.orc", "ORC", 50L)))
    IcebergWriter.rewriteCompact(spark, root)
    val snap = graft.sources.IcebergTable.snapshot(spark, root)
    assert(snap.dataFiles.nonEmpty &&
      snap.dataFiles.forall(_.format.equalsIgnoreCase("PARQUET")),
      s"compaction must rewrite to parquet, got ${snap.dataFiles.map(_.format).distinct}")
    val compacted = IcebergTable.read(spark, root)
    assert(compacted.count() === 50)
    assert(compacted.agg(sum("id")).head().getLong(0) === (0L until 50L).sum)
    // the refusal's reason is gone: position deletes now apply
    val dataPath = snap.dataFiles.head.path
    IcebergWriter.addPositionDeletes(spark, root, Seq(dataPath -> Seq(0L, 1L)))
    val afterDelete = IcebergTable.read(spark, root)
    assert(afterDelete.count() === 48)
  }

  test("field-id binding rule: an id-carrying file never name-binds a column whose id it lacks") {
    import org.apache.spark.sql.types._
    // rename-then-readd: table has note (id 2, was 'label') and a NEW
    // label (id 4); the old file carries its column as 'label' with id 2
    val cols = Seq(("note", Some(2), StringType: DataType), ("label", Some(4), StringType: DataType))
    val byId = Map(2 -> 0)
    val byName = Map("label" -> 0)
    val b = graft.sources.IcebergForeignData.binding(
      cols, Map.empty, byId, byName, Map.empty, (v, _) => v)
    assert(b(0) === Right(0), "note (id 2) binds by id to the file's old 'label' column")
    assert(b(1) === Left(null),
      "the NEW 'label' (id 4) must read null, not steal the old id-2 data by name")
    // an id-LESS file (non-conformant writer): name equality engages
    val b2 = graft.sources.IcebergForeignData.binding(
      cols, Map.empty, Map.empty, byName, Map.empty, (v, _) => v)
    assert(b2(1) === Right(0))
  }

  test("pushed filters compile to a SearchArgument: a tight filter DECODES a row-group-" +
    "sized subset, not the file (r16)") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = orcSchema("id", "label", "ts")
    // 50k rows sorted by id, 1k-row index stride -> ~50 row groups
    val path = s"$root/data/big.orc"
    new java.io.File(path).getParentFile.mkdirs()
    val w = OrcFile.createWriter(new Path(path),
      OrcFile.writerOptions(new Configuration()).setSchema(s)
        .useUTCTimestamp(true).rowIndexStride(1000))
    val batch = s.createRowBatch()
    (0L until 50000L).foreach { i =>
      val j = batch.size
      batch.cols(0).asInstanceOf[LongColumnVector].vector(j) = i
      val lv = batch.cols(1).asInstanceOf[BytesColumnVector]
      val b = s"n$i".getBytes("UTF-8"); lv.setRef(j, b, 0, b.length)
      val tv = batch.cols(2).asInstanceOf[TimestampColumnVector]
      tv.time(j) = Math.floorDiv(usBase + i, 1000L)
      tv.nanos(j) = (Math.floorMod(usBase + i, 1000000L) * 1000L).toInt
      batch.size += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
    IcebergHandBuilt.publish(root, Seq((path, "ORC", 50000L)))
    // the public read path: the relation must push the filter and still
    // return the exact answer
    val got = IcebergTable.read(spark, root).filter(col("id") === 4242L).collect()
    assert(got.length === 1 && got(0).getString(1) === "n4242")
    // decoded-row accounting: buildScan's RDD yields the rows that
    // SURVIVE the SearchArgument, before Spark's re-filter
    val snap = IcebergTable.snapshot(spark, root)
    def decoded(filters: Array[org.apache.spark.sql.sources.Filter]): Long =
      graft.sources.IcebergOrcData.rdd(spark, snap.schema, snap.dataFiles,
        snap.partitionFields, Array("id"), filters).count()
    val all = decoded(Array.empty)
    val pruned = decoded(Array(org.apache.spark.sql.sources.EqualTo("id", 4242L)))
    assert(all === 50000L)
    assert(pruned <= 2048L,
      s"a point filter over 50 row groups must decode ~1 group, decoded $pruned")
    // a filter on a renamed-away column still skips: the SARG binds by
    // the FILE's name through the field-id map
    val ranged = decoded(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("id", 49000L)))
    assert(ranged >= 1000L && ranged <= 3072L, s"range tail decoded $ranged")
    // an IN carrying NULL must not push (orc's boxLiteral would NPE) —
    // the query still answers correctly through Spark's re-filter
    val inNull = IcebergTable.read(spark, root)
      .filter(col("id").isin(lit(4242L), lit(null))).collect()
    assert(inNull.length === 1 && inNull(0).getLong(0) === 4242L)
    assert(decoded(Array(org.apache.spark.sql.sources.In("id",
      Array[Any](4242L, null)))) === 50000L, "null-carrying IN must scan, not crash")
  }

  test("DATE filters push zone-proofed (r17): epoch-day SARG skips row groups on a " +
    "time-partitioned-heritage shape, both java.sql.Date and LocalDate literal forms") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    // (id long, d date) — DATE is ORC epoch days in a LongColumnVector
    val s = TypeDescription.createStruct()
      .addField("id", TypeDescription.createLong().setAttribute("iceberg.id", "1"))
      .addField("d", TypeDescription.createDate().setAttribute("iceberg.id", "2"))
    val path = s"$root/data/dated.orc"
    new java.io.File(path).getParentFile.mkdirs()
    val w = OrcFile.createWriter(new Path(path),
      OrcFile.writerOptions(new Configuration()).setSchema(s)
        .useUTCTimestamp(true).rowIndexStride(1000))
    val batch = s.createRowBatch()
    // 50k rows over 500 consecutive days (100 rows/day, date-sorted) —
    // each 1000-row group spans ~10 days, the Hive-heritage layout
    val day0 = 18000L // 2019-04-14, proleptic epoch day
    (0L until 50000L).foreach { i =>
      val j = batch.size
      batch.cols(0).asInstanceOf[LongColumnVector].vector(j) = i
      batch.cols(1).asInstanceOf[LongColumnVector].vector(j) = day0 + i / 100L
      batch.size += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
    IcebergHandBuilt.publish(root, Seq((path, "ORC", 50000L)),
      fieldsJson =
        """{"id":1,"name":"id","required":false,"type":"long"},
          |    {"id":2,"name":"d","required":false,"type":"date"}""".stripMargin,
      lastColumnId = 2)
    val targetDay = java.time.LocalDate.ofEpochDay(day0 + 250L)
    // the public read path answers exactly through the pushed filter
    val got = IcebergTable.read(spark, root)
      .filter(col("d") === lit(java.sql.Date.valueOf(targetDay))).collect()
    assert(got.length === 100 && got.forall(_.getDate(1) === java.sql.Date.valueOf(targetDay)))
    // decoded-row accounting: rows surviving the SARG, before re-filter
    val snap = IcebergTable.snapshot(spark, root)
    def decoded(filters: Array[org.apache.spark.sql.sources.Filter]): Long =
      graft.sources.IcebergOrcData.rdd(spark, snap.schema, snap.dataFiles,
        snap.partitionFields, Array("id"), filters).count()
    assert(decoded(Array.empty) === 50000L)
    // a one-day filter over 50 row groups must decode ~1 group — via
    // the java.sql.Date literal Spark ships by default...
    val viaSqlDate = decoded(Array(org.apache.spark.sql.sources.EqualTo(
      "d", java.sql.Date.valueOf(targetDay))))
    assert(viaSqlDate <= 2048L, s"date point filter decoded $viaSqlDate of 50000")
    // ...and via the java.time.LocalDate form (datetime.java8API.enabled)
    val viaLocalDate = decoded(Array(org.apache.spark.sql.sources.EqualTo(
      "d", targetDay)))
    assert(viaLocalDate === viaSqlDate, "both literal forms must prune identically")
    // a date-range tail: last 50 of 500 days ≈ 5k rows + group slack
    val ranged = decoded(Array(org.apache.spark.sql.sources.GreaterThanOrEqual(
      "d", java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(day0 + 450L)))))
    assert(ranged >= 5000L && ranged <= 7168L, s"date range tail decoded $ranged")
  }

  test("TIMESTAMP filters push (r18): timestamptz SARG skips row groups, java.sql.Timestamp " +
    "and Instant literal forms prune identically") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = orcSchema("id", "label", "ts")
    val path = s"$root/data/tstz.orc"
    new java.io.File(path).getParentFile.mkdirs()
    val w = OrcFile.createWriter(new Path(path),
      OrcFile.writerOptions(new Configuration()).setSchema(s)
        .useUTCTimestamp(true).rowIndexStride(1000))
    val batch = s.createRowBatch()
    // 50k rows over 500 consecutive hours (100 rows/hour, time-sorted) —
    // each 1000-row group spans ~10 hours, the event-log layout
    (0L until 50000L).foreach { i =>
      val j = batch.size
      batch.cols(0).asInstanceOf[LongColumnVector].vector(j) = i
      val lv = batch.cols(1).asInstanceOf[BytesColumnVector]
      val b = s"n$i".getBytes("UTF-8"); lv.setRef(j, b, 0, b.length)
      val us = usBase + (i / 100L) * 3_600_000_000L
      val tv = batch.cols(2).asInstanceOf[TimestampColumnVector]
      tv.time(j) = Math.floorDiv(us, 1000L)
      tv.nanos(j) = (Math.floorMod(us, 1000000L) * 1000L).toInt
      batch.size += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
    IcebergHandBuilt.publish(root, Seq((path, "ORC", 50000L)))
    val target = java.time.Instant.ofEpochSecond(usBase / 1_000_000L).plusSeconds(250L * 3600L)
    // the public read path answers exactly through the pushed filter
    val got = IcebergTable.read(spark, root)
      .filter(col("ts") === lit(java.sql.Timestamp.from(target))).collect()
    assert(got.length === 100 && got.forall(_.getTimestamp(2).toInstant === target))
    val snap = IcebergTable.snapshot(spark, root)
    def decoded(filters: Array[org.apache.spark.sql.sources.Filter]): Long =
      graft.sources.IcebergOrcData.rdd(spark, snap.schema, snap.dataFiles,
        snap.partitionFields, Array("id"), filters).count()
    assert(decoded(Array.empty) === 50000L)
    // a one-hour filter over 50 row groups must decode ~1 group — via
    // the java.sql.Timestamp literal Spark ships by default...
    val viaSqlTs = decoded(Array(org.apache.spark.sql.sources.EqualTo(
      "ts", java.sql.Timestamp.from(target))))
    assert(viaSqlTs <= 2048L, s"timestamp point filter decoded $viaSqlTs of 50000")
    // ...and via the java.time.Instant form (datetime.java8API.enabled)
    val viaInstant = decoded(Array(org.apache.spark.sql.sources.EqualTo("ts", target)))
    assert(viaInstant === viaSqlTs, "both literal forms must prune identically")
    // a range tail: last 50 of 500 hours ≈ 5k rows + group slack
    val ranged = decoded(Array(org.apache.spark.sql.sources.GreaterThanOrEqual(
      "ts", java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(usBase / 1_000_000L).plusSeconds(450L * 3600L)))))
    assert(ranged >= 5000L && ranged <= 7168L, s"timestamp range tail decoded $ranged")
  }

  test("TIMESTAMP NTZ filters push zone-proofed (r18): a Hive-heritage file (non-UTC " +
    "writer, writer zone != reader zone) skips row groups with NO false skips") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    // bare ORC timestamp (NTZ): the writer records WALL CLOCKS under its
    // own JVM zone — pick a half-hour-offset zone so any zone leak in
    // the SARG path lands mid-row-group, not on a group boundary
    val s = TypeDescription.createStruct()
      .addField("id", TypeDescription.createLong().setAttribute("iceberg.id", "1"))
      .addField("tsn", TypeDescription.createTimestamp().setAttribute("iceberg.id", "2"))
    val path = s"$root/data/ntz.orc"
    new java.io.File(path).getParentFile.mkdirs()
    val writerZone = java.util.TimeZone.getTimeZone("Asia/Kathmandu") // UTC+5:45
    val wallBase = java.time.LocalDateTime.of(2023, 6, 15, 0, 0, 0)
    val saved = java.util.TimeZone.getDefault
    assert(saved.getRawOffset !== writerZone.getRawOffset,
      "fixture needs writer zone != reader zone to prove anything")
    try {
      java.util.TimeZone.setDefault(writerZone) // the heritage writer's JVM zone
      val w = OrcFile.createWriter(new Path(path),
        OrcFile.writerOptions(new Configuration()).setSchema(s)
          .useUTCTimestamp(false).rowIndexStride(1000)) // Hive-heritage: NOT UTC
      val batch = s.createRowBatch()
      // 50k rows over 500 consecutive hours of wall clock (100 rows/hour)
      (0L until 50000L).foreach { i =>
        val j = batch.size
        batch.cols(0).asInstanceOf[LongColumnVector].vector(j) = i
        val wall = wallBase.plusHours(i / 100L)
        val tv = batch.cols(1).asInstanceOf[TimestampColumnVector]
        // a non-UTC writer interprets vector millis in ITS default zone
        tv.time(j) = wall.atZone(writerZone.toZoneId).toInstant.toEpochMilli
        tv.nanos(j) = 0
        batch.size += 1
        if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
      }
      if (batch.size > 0) w.addRowBatch(batch)
      w.close()
    } finally java.util.TimeZone.setDefault(saved)
    IcebergHandBuilt.publish(root, Seq((path, "ORC", 50000L)),
      fieldsJson =
        """{"id":1,"name":"id","required":false,"type":"long"},
          |    {"id":2,"name":"tsn","required":false,"type":"timestamp"}""".stripMargin,
      lastColumnId = 2)
    val targetWall = wallBase.plusHours(250L)
    // the public read path: exactness IS the zone proof — a SARG that
    // leaked any zone offset (5:45 here) would skip the matching group
    val got = IcebergTable.read(spark, root)
      .filter(col("tsn") === lit(targetWall)).collect()
    assert(got.length === 100,
      s"NTZ equality under writer-zone divergence returned ${got.length} of 100")
    assert(got.forall(r => r.getAs[java.time.LocalDateTime]("tsn") === targetWall))
    val snap = IcebergTable.snapshot(spark, root)
    def decoded(filters: Array[org.apache.spark.sql.sources.Filter]): Long =
      graft.sources.IcebergOrcData.rdd(spark, snap.schema, snap.dataFiles,
        snap.partitionFields, Array("id"), filters).count()
    assert(decoded(Array.empty) === 50000L)
    val pruned = decoded(Array(org.apache.spark.sql.sources.EqualTo("tsn", targetWall)))
    assert(pruned <= 2048L, s"NTZ point filter decoded $pruned of 50000")
    assert(pruned >= 100L, "the matching rows themselves must survive the SARG")
  }

  test("DECIMAL filters push (r18): amount SARG skips row groups, numeric (scale-free) " +
    "comparison, BigDecimal literal") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    // (id long, amount decimal(12,2)) — the fact-table money shape
    val s = TypeDescription.createStruct()
      .addField("id", TypeDescription.createLong().setAttribute("iceberg.id", "1"))
      .addField("amount", TypeDescription.createDecimal()
        .withPrecision(12).withScale(2).setAttribute("iceberg.id", "2"))
    val path = s"$root/data/dec.orc"
    new java.io.File(path).getParentFile.mkdirs()
    val w = OrcFile.createWriter(new Path(path),
      OrcFile.writerOptions(new Configuration()).setSchema(s)
        .useUTCTimestamp(true).rowIndexStride(1000))
    val batch = s.createRowBatch()
    // 50k rows, amount = i cents, amount-sorted -> ~50 row groups of
    // tight decimal min/max
    (0L until 50000L).foreach { i =>
      val j = batch.size
      batch.cols(0).asInstanceOf[LongColumnVector].vector(j) = i
      batch.cols(1).asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.DecimalColumnVector]
        .set(j, org.apache.hadoop.hive.common.`type`.HiveDecimal.create(
          java.math.BigDecimal.valueOf(i, 2)))
      batch.size += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
    IcebergHandBuilt.publish(root, Seq((path, "ORC", 50000L)),
      fieldsJson =
        """{"id":1,"name":"id","required":false,"type":"long"},
          |    {"id":2,"name":"amount","required":false,"type":"decimal(12, 2)"}""".stripMargin,
      lastColumnId = 2)
    val target = java.math.BigDecimal.valueOf(42420L, 2) // 424.20 (amounts span 0.00-499.99)
    // the public read path answers exactly through the pushed filter
    val got = IcebergTable.read(spark, root)
      .filter(col("amount") === lit(target)).collect()
    assert(got.length === 1 && got(0).getLong(0) === 42420L)
    val snap = IcebergTable.snapshot(spark, root)
    def decoded(filters: Array[org.apache.spark.sql.sources.Filter]): Long =
      graft.sources.IcebergOrcData.rdd(spark, snap.schema, snap.dataFiles,
        snap.partitionFields, Array("id"), filters).count()
    assert(decoded(Array.empty) === 50000L)
    // a point filter over ~50 row groups must decode ~1 group
    val pruned = decoded(Array(org.apache.spark.sql.sources.EqualTo("amount", target)))
    assert(pruned <= 2048L, s"decimal point filter decoded $pruned of 50000")
    // scale-free numeric comparison: the same value at a DIFFERENT
    // scale (4242.0, one fractional digit) must prune identically
    val otherScale = decoded(Array(org.apache.spark.sql.sources.EqualTo(
      "amount", new java.math.BigDecimal("424.2"))))
    assert(otherScale === pruned, "decimal comparison must be numeric, not scale-sensitive")
    // range tail: amount >= 450.00 ≈ the last 10% of rows + group slack
    val ranged = decoded(Array(org.apache.spark.sql.sources.GreaterThanOrEqual(
      "amount", java.math.BigDecimal.valueOf(45000L, 2))))
    assert(ranged >= 5000L && ranged <= 7168L, s"decimal range tail decoded $ranged")
  }

  test("add_files (r18): registers Spark-native ORC and parquet files metadata-only, " +
    "footer-true record counts, appends across calls, refuses unknown formats") {
    import spark.implicits._
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val a = (0L until 60L).map(i => (i, s"n$i")).toDF("id", "label")
    val b = (60L until 100L).map(i => (i, s"n$i")).toDF("id", "label")
    a.coalesce(1).write.orc(s"$root/raw_orc")
    b.coalesce(1).write.parquet(s"$root/raw_pq")
    def filesUnder(dir: String, ext: String): Seq[String] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(ext))
        .map(_.getAbsolutePath).toSeq
    val table = s"$root/t"
    // call 1: the ORC file creates the table
    IcebergWriter.addFiles(spark, table, a.schema, filesUnder(s"$root/raw_orc", ".orc"))
    assert(IcebergTable.read(spark, table).count() === 60)
    // call 2: the parquet file appends a snapshot — no data rewritten
    IcebergWriter.addFiles(spark, table, a.schema, filesUnder(s"$root/raw_pq", ".parquet"))
    val got = IcebergTable.read(spark, table)
    assert(got.count() === 100)
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 100L).sum)
    // manifest record counts are the FILES' footer counts, and the
    // registered paths are the original files in place
    val snap = IcebergTable.snapshot(spark, table)
    assert(snap.dataFiles.map(_.recordCount).sorted === Seq(40L, 60L))
    assert(snap.dataFiles.forall(f => f.path.contains("/raw_")))
    assert(snap.dataFiles.map(_.format).sorted === Seq("ORC", "PARQUET"))
    // unknown extension refuses loud
    val e = intercept[org.apache.spark.SparkException](
      IcebergWriter.addFiles(spark, s"$root/t2", a.schema, Seq(s"$root/x.csv")))
    assert(e.getMessage.contains("unsupported data file format") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported data file format")))
    // re-registering an already-registered file refuses loud (review
    // r18 — the reference procedure's check_duplicate_files): a
    // crash-retried add_files must never serve a file's rows twice
    val eDup = intercept[IllegalArgumentException](
      IcebergWriter.addFiles(spark, table, a.schema, filesUnder(s"$root/raw_pq", ".parquet")))
    assert(eDup.getMessage.contains("already registered"))
    // a mismatched declared schema refuses loud (review r18): silently
    // adopting the table's schema would null-read the files' columns
    val other = Seq((1L, 2.0)).toDF("id", "score")
    val eSchema = intercept[IllegalArgumentException](
      IcebergWriter.addFiles(spark, table, other.schema, Seq(s"$root/whatever.parquet")))
    assert(eSchema.getMessage.contains("does not match the"))
  }

  test("add_files resumes a PUBLISHED table from its own metadata (r18): registering " +
    "into a table this session never created appends a snapshot") {
    import spark.implicits._
    val root = new java.io.File(freshRoot()).getAbsolutePath
    // the existing table comes from the hand-built publisher — it is
    // NOT in the writer's in-memory state, so addFiles must resume
    // from version-hint + metadata JSON (the maintenance-verb path)
    val s = orcSchema("id", "label", "ts")
    writeOrc(s"$root/data/o0.orc", s, (0L until 50L).map(i => (i, s"n$i", usBase + i)))
    IcebergHandBuilt.publish(root, Seq((s"$root/data/o0.orc", "ORC", 50L)))
    val more = (50L until 80L).map(i =>
      (i, s"n$i", java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(1_700_000_000L).plusNanos(i * 1000))))
      .toDF("id", "label", "ts")
    more.coalesce(1).write.parquet(s"$root/extra")
    val extra = new java.io.File(s"$root/extra").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    IcebergWriter.addFiles(spark, root, more.schema, extra)
    val got = IcebergTable.read(spark, root)
    assert(got.count() === 80)
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 80L).sum)
  }

  test("add_files publishes schema.name-mapping.default (r19): adopted tables resolve " +
    "in conformant foreign readers, resume preserves the mapping, expire spares the files") {
    import spark.implicits._
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val a = (0L until 30L).map(i => (i, s"n$i")).toDF("id", "label")
    a.coalesce(1).write.parquet(s"$root/raw")
    def files(dir: String): Seq[String] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSeq
    val table = s"$root/t"
    IcebergWriter.addFiles(spark, table, a.schema, files(s"$root/raw"))
    def metaJson(): String = {
      val hint = java.nio.file.Paths.get(table, "metadata", "version-hint.text")
      val v = new String(java.nio.file.Files.readAllBytes(hint)).trim
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(table, "metadata", s"v$v.metadata.json")))
    }
    // the mapping is IN the published metadata, naming every field by id
    // — without it, registered files (no embedded field ids) null-read
    // in any spec-strict reader (Trino, Spark+iceberg-runtime)
    val m1 = metaJson()
    assert(m1.contains("schema.name-mapping.default"))
    assert(m1.contains(""""field-id\":1,\"names\":[\"id\"]""") ||
      m1.contains("""{"field-id":1,"names":["id"]}"""),
      s"mapping must name field 1 'id': $m1")
    // graft's own read resolves THROUGH the mapping (snapshot carries
    // it), not the bare name fallback
    val snap = IcebergTable.snapshot(spark, table)
    assert(snap.nameMapping === Map(1 -> Seq("id"), 2 -> Seq("label")))
    assert(IcebergTable.read(spark, table)
      .agg(sum("id")).head().getLong(0) === (0L until 30L).sum)
    // resume from a FRESH session keeps the property
    IcebergWriter.forgetState(table)
    val b = (30L until 50L).map(i => (i, s"n$i")).toDF("id", "label")
    b.coalesce(1).write.parquet(s"$root/raw2")
    IcebergWriter.addFiles(spark, table, a.schema, files(s"$root/raw2"))
    assert(metaJson().contains("schema.name-mapping.default"))
    assert(IcebergTable.read(spark, table).count() === 50)
    // the same property marks the data files as ADOPTED, not
    // writer-owned: expiring the first snapshot must not delete them
    val adopted = files(s"$root/raw")
    IcebergWriter.expireSnapshots(spark, table, keepLast = 1)
    assert(adopted.forall(f => new java.io.File(f).exists()),
      "expire deleted adopted data files — registration adopts metadata, not data lifecycle")
  }

  test("partitioned add_files (r19): hive `c=v` layouts register with typed identity " +
    "partition tuples, equality filters prune to one partition's files") {
    import spark.implicits._
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val df = (0L until 90L).map(i => (i, s"t${i % 3}", i * 1.5)).toDF("id", "cat", "value")
    df.repartition(2).write.partitionBy("cat").parquet(s"$root/raw")
    def hiveFiles(dir: String, ext: String): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.filterNot(_.getName.startsWith("_")).flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir)).map(_.getAbsolutePath).filter(_.endsWith(ext)).sorted
    }
    val table = s"$root/t"
    // declared schema carries the partition column; the FILES don't
    val schema = df.schema
    IcebergWriter.addFiles(spark, table, schema, hiveFiles(s"$root/raw", ".parquet"),
      partitionCols = Seq("cat"))
    val got = spark.read.format("graft-iceberg").load(table)
    assert(got.count() === 90)
    // the partition column reconstructs from the manifest's typed values
    assert(got.groupBy("cat").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("t0" -> 30L, "t1" -> 30L, "t2" -> 30L))
    assert(got.filter(col("cat") === "t1").agg(sum("id")).head().getLong(0)
      === (0L until 90L).filter(_ % 3 == 1).sum)
    // equality filter prunes the scan to ONE partition's files
    val perPart = hiveFiles(s"$root/raw/cat=t1", ".parquet").size.toLong
    val pruned = got.filter(col("cat") === "t1")
    pruned.collect()
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metrics("numFiles").value
    }
    assert(scanned.contains(perPart),
      s"expected $perPart scanned files for one partition, got $scanned")
    // manifests carry the typed tuple
    val snap = IcebergTable.snapshot(spark, table)
    assert(snap.dataFiles.forall(_.partition.get("cat").exists(_.toString.startsWith("t"))))
    // ORC hive layouts register the same way and reconstruct through
    // the eager ORC leg
    val root2 = new java.io.File(freshRoot()).getAbsolutePath
    df.repartition(2).write.partitionBy("cat").orc(s"$root2/raw")
    IcebergWriter.addFiles(spark, s"$root2/t", schema, hiveFiles(s"$root2/raw", ".orc"),
      partitionCols = Seq("cat"))
    val gotOrc = IcebergTable.read(spark, s"$root2/t")
    assert(gotOrc.count() === 90)
    assert(gotOrc.filter(col("cat") === "t2").count() === 30)
    // a file with no `c=v` segment for the declared column refuses loud
    val flat = (0L until 5L).map(i => (i, "x", 0.0)).toDF("id", "cat", "value")
    flat.coalesce(1).write.parquet(s"$root/flat")
    val eSeg = intercept[IllegalArgumentException](
      IcebergWriter.addFiles(spark, table, schema, hiveFiles(s"$root/flat", ".parquet"),
        partitionCols = Seq("cat")))
    assert(eSeg.getMessage.contains("no hive `c=v` segment"))
    // layout disagreement with the EXISTING table refuses loud
    val eSpec = intercept[IllegalArgumentException](
      IcebergWriter.addFiles(spark, table, schema, hiveFiles(s"$root/flat", ".parquet")))
    assert(eSpec.getMessage.contains("layouts must agree"))
  }

  test("add_files collectStats (r19): footer min/max/null-counts land as manifest bounds " +
    "so adopted tables data-skip; absent footer stats degrade soundly") {
    import spark.implicits._
    val root = new java.io.File(freshRoot()).getAbsolutePath
    // two disjoint id ranges in two parquet files + two orc files
    val lo = (0L until 50L).map(i => (i, s"n$i", i * 2.0)).toDF("id", "label", "score")
    val hi = (1000L until 1050L).map(i => (i, s"n$i", i * 2.0)).toDF("id", "label", "score")
    lo.coalesce(1).write.parquet(s"$root/pq_lo")
    hi.coalesce(1).write.parquet(s"$root/pq_hi")
    def files(dir: String, ext: String): Seq[String] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(ext))
        .map(_.getAbsolutePath).toSeq
    val table = s"$root/t"
    IcebergWriter.addFiles(spark, table, lo.schema,
      files(s"$root/pq_lo", ".parquet") ++ files(s"$root/pq_hi", ".parquet"),
      collectStats = true)
    val snap = IcebergTable.snapshot(spark, table)
    assert(snap.dataFiles.size === 2)
    // bounds present for every supported column (ids 1..3), null
    // counts zero, value counts = record counts
    snap.dataFiles.foreach { f =>
      assert(f.lower.keySet === Set(1, 2, 3), s"lower bounds ${f.lower.keySet}")
      assert(f.upper.keySet === Set(1, 2, 3))
      assert(f.nullCounts.values.forall(_ === 0L))
      assert(f.valueCounts.values.forall(_ === f.recordCount))
    }
    // the bounds are the footer's true min/max: a range filter scans
    // ONE file end to end
    val got = spark.read.format("graft-iceberg").load(table)
    val prunedQ = got.filter(col("id") >= 1000L)
    assert(prunedQ.collect().length === 50)
    val scanned = prunedQ.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metrics("numFiles").value
    }
    assert(scanned.contains(1L), s"expected 1 scanned file with adopted stats, got $scanned")
    // ORC footers translate the same way (bounds land in the manifest)
    val root2 = new java.io.File(freshRoot()).getAbsolutePath
    lo.coalesce(1).write.orc(s"$root2/orc_lo")
    hi.coalesce(1).write.orc(s"$root2/orc_hi")
    IcebergWriter.addFiles(spark, s"$root2/t", lo.schema,
      files(s"$root2/orc_lo", ".orc") ++ files(s"$root2/orc_hi", ".orc"),
      collectStats = true)
    val snapOrc = IcebergTable.snapshot(spark, s"$root2/t")
    assert(snapOrc.dataFiles.size === 2)
    snapOrc.dataFiles.foreach { f =>
      assert(f.lower.keySet === Set(1, 2, 3) && f.upper.keySet === Set(1, 2, 3))
      assert(f.nullCounts.values.forall(_ === 0L))
    }
    // the bounds are Appendix-D exact: the hi file's id lower bound
    // decodes to its true minimum (what any Iceberg planner prunes on)
    val hiEntry = snapOrc.dataFiles.find(_.path.contains("orc_hi")).get
    def leLong(b: Array[Byte]): Long =
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    assert(leLong(hiEntry.lower(1)) === 1000L && leLong(hiEntry.upper(1)) === 1049L)
    assert(IcebergTable.read(spark, s"$root2/t").filter(col("id") >= 1000L).count() === 50)
    // sound degradation: an all-null column gets null counts but NO
    // bounds, and a timestamp column is skipped entirely (adoption
    // reads arbitrary writers' files — zone-hazardous stats stay out)
    val nulls = (0L until 10L).map(i =>
      (i, Option.empty[String], new java.sql.Timestamp(1700000000000L + i)))
      .toDF("id", "label", "ts")
    nulls.coalesce(1).write.parquet(s"$root/pq_nulls")
    IcebergWriter.addFiles(spark, s"$root/t3", nulls.schema,
      files(s"$root/pq_nulls", ".parquet"), collectStats = true)
    val snap3 = IcebergTable.snapshot(spark, s"$root/t3")
    val f3 = snap3.dataFiles.head
    assert(!f3.lower.contains(2) && !f3.upper.contains(2), "all-null column must carry no bounds")
    assert(f3.nullCounts.get(2).contains(10L))
    assert(!f3.lower.contains(3) && !f3.upper.contains(3), "timestamp bounds are skipped")
    assert(IcebergTable.read(spark, s"$root/t3").count() === 10)
  }

  test("heritage-writer SARG guards (r19): pre-ORC-135 timestamp stats and ORC-135-era " +
    "small-precision decimal stats must NOT row-group-skip — the refuse-to-evaluate " +
    "path the pushdown legs rely on, pinned against orc-core's own evaluator") {
    // The r18 TIMESTAMP/DECIMAL pushdown work reasons (in
    // IcebergOrcData's comments) that orc-core's evaluatePredicateProto
    // refuses to evaluate heritage-writer stats, so a false row-group
    // skip — unrecoverable: Spark-side re-apply cannot resurrect
    // undecoded rows — cannot happen. Both r18 fixtures WRITE with
    // current orc-core, so that refusal path had no coverage (r18
    // advice): this case drives the evaluator directly with doctored
    // writer versions and stats protos, the exact seam a heritage file
    // presents.
    import org.apache.hadoop.hive.ql.io.sarg.{PredicateLeaf, SearchArgumentFactory}
    import org.apache.hadoop.hive.ql.io.sarg.SearchArgument.TruthValue
    import org.apache.orc.OrcProto
    import org.apache.orc.impl.GraftOrcEvalAccess
    def skips(t: TruthValue): Boolean = t == TruthValue.NO || t == TruthValue.NO_NULL
    // --- TIMESTAMP: stats carry only writer-zone millis (the
    // pre-ORC-135 serialization, no minimumUtc); the predicate sits
    // YEARS outside the stats range, so a naive range compare WOULD
    // skip — the writer-version guard must refuse instead
    val tsLeaf = {
      val b = SearchArgumentFactory.newBuilder()
      b.startAnd().equals("ts", PredicateLeaf.Type.TIMESTAMP,
        java.sql.Timestamp.valueOf("2030-06-01 00:00:00")).end()
      b.build().getLeaves.get(0)
    }
    val tsType = TypeDescription.createTimestamp()
    val heritageTs = OrcProto.ColumnStatistics.newBuilder()
      .setNumberOfValues(100L).setHasNull(false)
      .setTimestampStatistics(OrcProto.TimestampStatistics.newBuilder()
        .setMinimum(1_000_000_000_000L).setMaximum(1_000_000_900_000L)) // 2001, writer zone
      .build()
    val vHeritage = GraftOrcEvalAccess.evaluate(heritageTs, tsLeaf, OrcFile.WriterVersion.HIVE_8732, tsType)
    assert(!skips(vHeritage),
      s"pre-ORC-135 timestamp stats must refuse to evaluate, got $vHeritage")
    // sanity: the SAME disjoint range with UTC stats from a current
    // writer DOES skip — the guard is the only thing standing down
    val modernTs = OrcProto.ColumnStatistics.newBuilder()
      .setNumberOfValues(100L).setHasNull(false)
      .setTimestampStatistics(OrcProto.TimestampStatistics.newBuilder()
        .setMinimum(1_000_000_000_000L).setMaximum(1_000_000_900_000L)
        .setMinimumUtc(1_000_000_000_000L).setMaximumUtc(1_000_000_900_000L))
      .build()
    val vModern = GraftOrcEvalAccess.evaluate(modernTs, tsLeaf, OrcFile.WriterVersion.ORC_14, tsType)
    assert(skips(vModern), s"current-writer UTC stats must skip the disjoint group, got $vModern")
    // --- DECIMAL: the ORC-517 bug window is writer version ORC_135
    // exactly, for decimal64 precisions (<= 18) — those stats must
    // refuse even when the range is disjoint
    val decLeaf = {
      val b = SearchArgumentFactory.newBuilder()
      b.startAnd().equals("amount", PredicateLeaf.Type.DECIMAL,
        new org.apache.hadoop.hive.serde2.io.HiveDecimalWritable("9999.99")).end()
      b.build().getLeaves.get(0)
    }
    val decType = TypeDescription.createDecimal().withPrecision(10).withScale(2)
    val decStats = OrcProto.ColumnStatistics.newBuilder()
      .setNumberOfValues(100L).setHasNull(false)
      .setDecimalStatistics(OrcProto.DecimalStatistics.newBuilder()
        .setMinimum("10.00").setMaximum("20.00"))
      .build()
    val vDecHeritage = GraftOrcEvalAccess.evaluate(decStats, decLeaf, OrcFile.WriterVersion.ORC_135, decType)
    assert(!skips(vDecHeritage),
      s"ORC-135-era decimal64 stats must refuse to evaluate, got $vDecHeritage")
    val vDecModern = GraftOrcEvalAccess.evaluate(decStats, decLeaf, OrcFile.WriterVersion.ORC_517, decType)
    assert(skips(vDecModern),
      s"post-ORC-517 decimal stats must skip the disjoint group, got $vDecModern")
  }

  test("v2 deletes over ORC entries refuse loud naming the fix") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType)))
    val snap = IcebergTable.IcebergSnapshot(1L, 0L, 2, schema, Nil,
      dataFiles = Seq(IcebergTable.DataFileEntry("/x/data/o.orc", "ORC", 1L, 1L, 1L,
        Map.empty, Map.empty, Map.empty, Map.empty, Map.empty)),
      deleteFiles = Seq(IcebergTable.DeleteFileEntry("/x/data/d.parquet", 1, 1L, 2L, Nil)))
    val e = intercept[IllegalArgumentException](
      IcebergTable.readSnapshot(spark, "/x", snap))
    assert(e.getMessage.contains("deletes over AVRO/ORC") &&
      e.getMessage.contains("rewriteCompact"))
  }
}
