package graft

import graft.sources.{IcebergTable, IcebergWriter}
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
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

  private def writeAvro(path: String, schema: Schema, rs: Seq[GenericRecord]): Unit =
    IcebergHandBuilt.writeAvro(path, schema, rs)

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

  private def publish(root: String, files: Seq[(String, String, Long)]): Unit =
    IcebergHandBuilt.publish(root, files)

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

  test("an UNKNOWN data-file format stays a loud refusal naming the format") {
    // ORC gained its own read leg (IcebergOrcSpec) — the refusal now
    // covers formats with no leg at all
    val root = new java.io.File(freshRoot()).getAbsolutePath
    val s = dataSchema("id", "label", "ts")
    writeAvro(s"$root/data/a0.avro", s, Seq(dataRec(s, 1L, "x", usBase)))
    publish(root, Seq((s"$root/data/a0.avro", "PUFFIN", 1L)))
    val e = intercept[Exception](IcebergTable.read(spark, root).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("PUFFIN") || m.contains("unsupported")),
      s"an unknown format must refuse loud: ${msgs(e).mkString(" | ")}")
  }
}
