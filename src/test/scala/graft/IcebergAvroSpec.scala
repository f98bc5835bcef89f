package graft

import graft.sources.{IcebergTable, IcebergWriter}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** AVRO data-file read leg (r15): hand-built spec-conformant tables —
  * metadata JSON + Avro manifests + Avro DATA files with `field-id`
  * props — so these cases pin the FORMAT (the Flink-written shape), not
  * a round trip through graft's own writer (which emits parquet only,
  * deliberately). */
class IcebergAvroSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("iceavro").toString + "/t"

  private def writeAvro(path: String, schema: Schema, rs: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    val f = new java.io.File(path); f.getParentFile.mkdirs()
    w.create(schema, f); rs.foreach(w.append); w.close()
  }

  /** An Iceberg data-file Avro schema over (id long, label string,
    * ts timestamptz) with the given NAMES but fixed field ids 1/2/3 —
    * renamed files must still resolve by id. */
  private def dataSchema(idName: String, labelName: String, tsName: String): Schema =
    new Schema.Parser().parse(
      s"""{"type":"record","name":"t","fields":[
         |  {"name":"$idName","type":["null","long"],"default":null,"field-id":1},
         |  {"name":"$labelName","type":["null","string"],"default":null,"field-id":2},
         |  {"name":"$tsName","type":["null",{"type":"long","logicalType":"timestamp-micros","adjust-to-utc":true}],"default":null,"field-id":3}
         |]}""".stripMargin)

  private def dataRec(s: Schema, id: Long, label: String, us: Long): GenericRecord = {
    val r = new GenericData.Record(s)
    val fs = s.getFields
    r.put(fs.get(0).name, id); r.put(fs.get(1).name, label); r.put(fs.get(2).name, us)
    r
  }

  /** Publish a table whose data files are the given (path, format,
    * rows) triples, schema fixed to (id, label, ts). */
  private def publish(root: String, files: Seq[(String, String, Long)]): Unit = {
    val entrySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"],"default":null},
        |  {"name":"sequence_number","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"content","type":"int"},
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"}
        |  ]}}
        |]}""".stripMargin)
    val entries = files.map { case (path, fmt, n) =>
      val dfRec = new GenericData.Record(entrySchema.getField("data_file").schema())
      dfRec.put("content", 0)
      dfRec.put("file_path", path)
      dfRec.put("file_format", fmt)
      dfRec.put("partition", new GenericData.Record(
        entrySchema.getField("data_file").schema().getField("partition").schema()))
      dfRec.put("record_count", n)
      dfRec.put("file_size_in_bytes", new java.io.File(path).length())
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("snapshot_id", 1L); e.put("data_file", dfRec)
      e
    }
    writeAvro(s"$root/metadata/m0.avro", entrySchema, entries)
    val listSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"},
        |  {"name":"partition_spec_id","type":"int"},
        |  {"name":"content","type":"int"},
        |  {"name":"sequence_number","type":"long"},
        |  {"name":"min_sequence_number","type":"long"},
        |  {"name":"added_snapshot_id","type":"long"}
        |]}""".stripMargin)
    val lr = new GenericData.Record(listSchema)
    lr.put("manifest_path", s"$root/metadata/m0.avro")
    lr.put("manifest_length", new java.io.File(s"$root/metadata/m0.avro").length())
    lr.put("partition_spec_id", 0); lr.put("content", 0)
    lr.put("sequence_number", 1L); lr.put("min_sequence_number", 1L)
    lr.put("added_snapshot_id", 1L)
    writeAvro(s"$root/metadata/snap-1.avro", listSchema, Seq(lr))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      s"""{
         |  "format-version": 2, "table-uuid": "a0000000-0000-0000-0000-000000000000",
         |  "location": "$root", "last-sequence-number": 1,
         |  "last-updated-ms": 1700000000000, "last-column-id": 3,
         |  "current-schema-id": 0,
         |  "schemas": [{"type":"struct","schema-id":0,"fields":[
         |    {"id":1,"name":"id","required":false,"type":"long"},
         |    {"id":2,"name":"label","required":false,"type":"string"},
         |    {"id":3,"name":"ts","required":false,"type":"timestamptz"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id":0,"fields":[]}],
         |  "last-partition-id": 999, "default-sort-order-id": 0,
         |  "sort-orders": [{"order-id":0,"fields":[]}], "properties": {},
         |  "current-snapshot-id": 1,
         |  "snapshots": [{"snapshot-id":1,"sequence-number":1,"timestamp-ms":1700000001000,
         |    "summary":{"operation":"append"},"manifest-list":"$root/metadata/snap-1.avro",
         |    "schema-id":0}],
         |  "snapshot-log": [{"timestamp-ms":1700000001000,"snapshot-id":1}]
         |}""".stripMargin)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/version-hint.text"), "1")
  }

  private val usBase = 1_700_000_000_000_000L // 2023-11-14T22:13:20Z in micros

  test("an all-AVRO table reads through IcebergTable.read (lazy path routes to the eager leg)") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = dataSchema("id", "label", "ts")
    writeAvro(s"$root/data/a0.avro", s, (0L until 40L).map(i => dataRec(s, i, s"n$i", usBase + i)))
    writeAvro(s"$root/data/a1.avro", s, (40L until 100L).map(i => dataRec(s, i, s"n$i", usBase + i)))
    publish(root, Seq((s"$root/data/a0.avro", "AVRO", 40L), (s"$root/data/a1.avro", "AVRO", 60L)))
    val got = IcebergTable.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "label", "ts"))
    assert(got.count() === 100)
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 100L).sum)
    // timestamptz decodes as the spec's UTC micros
    val t0 = got.filter(col("id") === 0L).select(col("ts")).head().getTimestamp(0)
    assert(t0.toInstant === java.time.Instant.ofEpochSecond(1_700_000_000L))
    // filters still work (applied post-read; file pruning happened upstream)
    assert(got.filter(col("id") >= 90L).count() === 10)
  }

  test("field-id resolution: a file written under OLD column names serves the renamed schema") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = dataSchema("id_v1", "old_label", "event_time")
    writeAvro(s"$root/data/a0.avro", s, Seq(dataRec(s, 7L, "seven", usBase)))
    publish(root, Seq((s"$root/data/a0.avro", "AVRO", 1L)))
    val got = IcebergTable.read(spark, root).collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === 7L && got(0).getString(1) === "seven",
      "values must bind by field-id, not by the file's old names")
  }

  test("a MIXED parquet+avro snapshot unions both legs (eager read)") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = dataSchema("id", "label", "ts")
    writeAvro(s"$root/data/a0.avro", s, (0L until 30L).map(i => dataRec(s, i, s"n$i", usBase + i)))
    // the parquet half goes through spark's writer with embedded field ids
    import spark.implicits._
    val pq = (30L until 100L).map(i =>
      (i, s"n$i", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1_700_000_000L)
        .plusNanos(i * 1000)))).toDF("id", "label", "ts")
    val idsSchema = IcebergWriter.withIds(pq.schema)
    val tmp = s"$root/.stage"
    spark.createDataFrame(pq.rdd, idsSchema).coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new java.io.File(s"$root/data/p0.parquet")
    dest.getParentFile.mkdirs(); assert(part.renameTo(dest))
    publish(root, Seq(
      (s"$root/data/a0.avro", "AVRO", 30L),
      (dest.getAbsolutePath, "PARQUET", 70L)))
    // the lazy sample hits the AVRO entry (manifest order) → eager route
    val got = IcebergTable.read(spark, root)
    assert(got.count() === 100)
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 100L).sum)
    assert(got.filter(col("id") === 55L).select("label").head().getString(0) === "n55")
  }

  test("ORC stays a loud refusal; unsupported avro value shapes fail loud naming the file") {
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = dataSchema("id", "label", "ts")
    writeAvro(s"$root/data/a0.avro", s, Seq(dataRec(s, 1L, "x", usBase)))
    publish(root, Seq((s"$root/data/a0.avro", "ORC", 1L)))
    val e = intercept[Exception](IcebergTable.read(spark, root).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("ORC") || m.contains("unsupported")),
      s"ORC must refuse loud: ${msgs(e).mkString(" | ")}")
  }
}
