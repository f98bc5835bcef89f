package graft.sources

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** AVRO DATA-file read leg (r15 — the r14 verdict's #6): the Iceberg
  * spec admits Avro data files (Appendix A) and some Flink pipelines
  * write them, but Spark's Avro FileFormat lives in the external
  * spark-avro module this environment doesn't ship — so this leg reads
  * them with Avro CORE (the same jars the manifest parser already
  * uses): one task per data file, records decoded straight to external
  * Rows in the table schema's order.
  *
  * Resolution is BY FIELD ID (the spec's rule): each Avro record field
  * carrying a `field-id` prop binds to the table column with that id,
  * so files written before a rename serve the renamed schema exactly
  * like the parquet leg; id-less fields (non-conformant writers) fall
  * back to name equality. A table column absent from the record serves
  * the manifest's identity-partition value when one exists, else null.
  *
  * Scale + honesty notes: this is an RDD leg — no column pruning, no
  * predicate pushdown, no WholeStageCodegen — priced as such (Avro is
  * a row format; even Iceberg's own readers decode whole rows). File
  *-level pruning still happened upstream (the caller passes the
  * already-pruned entry list). v2 deletes over Avro entries are
  * refused loud by the caller ([[IcebergTable.readSnapshot]]):
  * production tables compact to parquet, which is also the fix. */
object IcebergAvroData {

  /** One DataFrame over `entries` (all format AVRO), schema = the
    * table schema minus field-id metadata, one read task per file. */
  def frame(spark: SparkSession, tableSchema: StructType,
      entries: Seq[IcebergTable.DataFileEntry],
      partitionFields: Seq[IcebergTable.PartitionField]): DataFrame = {
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // shared with the ORC leg: one definition of field-id binding and
    // manifest identity decoding (IcebergForeignData)
    val cols = IcebergForeignData.tableCols(tableSchema)
    val identityOf = IcebergForeignData.identityOf(cols, partitionFields)
    val slices = math.max(1, math.min(entries.size,
      spark.sparkContext.defaultParallelism * 2))
    val rdd = spark.sparkContext.parallelize(entries, slices).flatMap { e =>
      val reader = new DataFileReader[GenericRecord](
        new FsInput(new Path(e.path), serConf.value),
        new GenericDatumReader[GenericRecord]())
      // a killed/failed task must not strand the open file handle
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ =>
          try reader.close() catch { case _: Throwable => () }))
      // per-file binding: table column -> record field position (or the
      // manifest identity value when the record lacks the column)
      val rs = reader.getSchema
      require(rs.getType == org.apache.avro.Schema.Type.RECORD,
        s"Avro data file ${e.path} top-level schema is ${rs.getType}, not a record")
      import scala.jdk.CollectionConverters._
      val byId: Map[Int, Int] = rs.getFields.asScala.zipWithIndex.flatMap { case (f, i) =>
        Option(f.getObjectProp("field-id")).collect {
          case n: java.lang.Number => n.intValue -> i
        }
      }.toMap
      val byName: Map[String, Int] =
        rs.getFields.asScala.zipWithIndex.map { case (f, i) => f.name -> i }.toMap
      val binding = IcebergForeignData.binding(cols, identityOf, byId, byName,
        e.partition, IcebergForeignData.externalOfManifest, e.path)
      val types: Array[DataType] = cols.toArray.map(_._3)
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = reader.hasNext
          if (!h) reader.close()
          h
        }
        def next(): Row = {
          val rec = reader.next()
          val vs = new Array[Any](binding.length)
          var i = 0
          while (i < binding.length) {
            vs(i) = binding(i) match {
              case Right(pos) => externalOfAvro(rec.get(pos), types(i), e.path)
              case Left(const) => const
            }
            i += 1
          }
          Row.fromSeq(vs.toIndexedSeq)
        }
      }
    }
    spark.createDataFrame(rdd, IcebergTable.stripIds(tableSchema))
  }

  /** Avro-decoded value → Spark EXTERNAL value under the table type
    * (spec Appendix A mappings: date = int days, timestamps = long
    * micros — timestamptz micros are UTC, timestamp micros are wall
    * clock). Anything else fails LOUD naming the file and type. */
  private def externalOfAvro(v: Any, dt: DataType, path: String): Any = {
    if (v == null) return null
    (dt, v) match {
      case (IntegerType, n: java.lang.Number) => n.intValue
      case (LongType, n: java.lang.Number) => n.longValue
      case (FloatType, n: java.lang.Number) => n.floatValue
      case (DoubleType, n: java.lang.Number) => n.doubleValue
      case (BooleanType, b: java.lang.Boolean) => b.booleanValue
      case (StringType, s) => s.toString // Utf8 or String
      case (BinaryType, b: java.nio.ByteBuffer) =>
        val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
      case (BinaryType, b: Array[Byte]) => b
      case (DateType, n: java.lang.Number) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n.longValue))
      case (TimestampType, n: java.lang.Number) =>
        val us = n.longValue
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          java.lang.Math.floorMod(us, 1000000L) * 1000L))
      case (TimestampNTZType, n: java.lang.Number) =>
        val us = n.longValue
        java.time.LocalDateTime.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          (java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case (t, o) => throw new IllegalStateException(
        s"Avro data file $path: no spec decoding for value class " +
          s"${o.getClass.getName} as ${t.sql} — unsupported")
    }
  }

}
