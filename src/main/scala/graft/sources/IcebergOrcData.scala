package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector._
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** ORC DATA-file read leg (r15 — the last open row of the r14 verdict's
  * "what's missing" #4): the Iceberg spec admits ORC data files
  * (Appendix A) and Hive-heritage pipelines write them. Spark's own ORC
  * FileFormat resolves columns BY NAME only, which mis-reads files
  * written before a rename — so, like the Avro leg, this reads with ORC
  * CORE (shipped in Spark's jars): one task per data file, vectorized
  * batches decoded to external Rows in the table schema's order.
  *
  * Resolution is BY FIELD ID (the spec's rule): Iceberg's ORC mapping
  * stores each column's id as the `iceberg.id` type attribute, so a
  * file written under old names binds to the renamed schema exactly
  * like the parquet and Avro legs; attribute-less files (non-conformant
  * writers) fall back to name equality. A table column absent from the
  * file serves the manifest's identity-partition value when one exists,
  * else null.
  *
  * Timestamps read with `useUTCTimestamp(true)` — the convention
  * Iceberg's own ORC reader uses — so both flavors are zone-proof:
  * `timestamp with local time zone` (timestamptz) decodes to the
  * instant, bare `timestamp` (the NTZ flavor) to the writer's wall
  * clock, independent of the executor's JVM zone.
  *
  * Scale + honesty notes: an RDD leg — no predicate pushdown, no
  * WholeStageCodegen — but unlike the Avro leg it DOES prune columns
  * (ORC is columnar; `Reader.Options.include` skips unbound streams).
  * File-level pruning still happened upstream (the caller passes the
  * already-pruned entry list). v2 deletes over ORC entries are refused
  * loud by the caller ([[IcebergTable.readSnapshot]]): compacting to
  * parquet is both the workaround and the production fix. */
object IcebergOrcData {

  private val IdAttr = "iceberg.id"

  /** One DataFrame over `entries` (all format ORC), schema = the table
    * schema minus field-id metadata, one read task per file. */
  def frame(spark: SparkSession, tableSchema: StructType,
      entries: Seq[IcebergTable.DataFileEntry],
      partitionFields: Seq[IcebergTable.PartitionField]): DataFrame = {
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // shared with the Avro leg: one definition of field-id binding and
    // manifest identity decoding (IcebergForeignData)
    val cols = IcebergForeignData.tableCols(tableSchema)
    val identityOf = IcebergForeignData.identityOf(cols, partitionFields)
    val slices = math.max(1, math.min(entries.size,
      spark.sparkContext.defaultParallelism * 2))
    val rdd = spark.sparkContext.parallelize(entries, slices).flatMap { e =>
      val reader = OrcFile.createReader(new Path(e.path),
        OrcFile.readerOptions(serConf.value).useUTCTimestamp(true))
      // register the close listener BEFORE anything else can throw
      // (non-struct root, rows()) — a failed-then-retried setup must
      // not strand open file handles across attempts
      var rowsOpt: Option[org.apache.orc.RecordReader] = None
      def closeAll(): Unit = {
        rowsOpt.foreach(r => try r.close() catch { case _: Throwable => () })
        try reader.close() catch { case _: Throwable => () }
      }
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => closeAll()))
      val sch = reader.getSchema
      require(sch.getCategory == TypeDescription.Category.STRUCT,
        s"ORC data file ${e.path} top-level type is ${sch.getCategory}, not a struct")
      import scala.jdk.CollectionConverters._
      val children = sch.getChildren.asScala.toIndexedSeq
      val names = sch.getFieldNames.asScala.toIndexedSeq
      val byId: Map[Int, Int] = children.zipWithIndex.flatMap { case (c, i) =>
        Option(c.getAttributeValue(IdAttr)).flatMap(_.toIntOption).map(_ -> i)
      }.toMap
      val byName: Map[String, Int] = names.zipWithIndex.toMap
      val binding = IcebergForeignData.binding(cols, identityOf, byId, byName,
        e.partition, IcebergForeignData.externalOfManifest, e.path)
      val types: Array[DataType] = cols.toArray.map(_._3)
      // columnar pruning: only bound children decode (include() wants
      // the full id-indexed mask, root included)
      val include = new Array[Boolean](sch.getMaximumId + 1)
      include(sch.getId) = true
      binding.foreach { case Right(pos) =>
        val c = children(pos)
        (c.getId to c.getMaximumId).foreach(include(_) = true)
      case _ => () }
      val rows = reader.rows(reader.options().include(include))
      rowsOpt = Some(rows)
      val batch = sch.createRowBatch()
      new Iterator[Row] {
        private var i = 0
        private var live = true
        private def advance(): Unit =
          if (live && i >= batch.size) {
            live = rows.nextBatch(batch); i = 0
            if (!live) closeAll()
          }
        def hasNext: Boolean = { advance(); live && i < batch.size }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException(s"ORC iterator over ${e.path} exhausted")
          val vs = new Array[Any](binding.length)
          var k = 0
          while (k < binding.length) {
            vs(k) = binding(k) match {
              case Right(pos) => externalOfOrc(batch.cols(pos), i, types(k), e.path)
              case Left(const) => const
            }
            k += 1
          }
          i += 1
          Row.fromSeq(vs.toIndexedSeq)
        }
      }
    }
    spark.createDataFrame(rdd, IcebergTable.stripIds(tableSchema))
  }

  /** One vector slot → Spark EXTERNAL value under the table type
    * (spec Appendix A's ORC mappings). Anything else fails LOUD naming
    * the file and type. */
  private def externalOfOrc(col: ColumnVector, row: Int, dt: DataType,
      path: String): Any = {
    val j = if (col.isRepeating) 0 else row
    if (!col.noNulls && col.isNull(j)) return null
    (dt, col) match {
      case (IntegerType, v: LongColumnVector) => v.vector(j).toInt
      case (LongType, v: LongColumnVector) => v.vector(j)
      case (BooleanType, v: LongColumnVector) => v.vector(j) != 0L
      case (DateType, v: LongColumnVector) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.vector(j)))
      case (FloatType, v: DoubleColumnVector) => v.vector(j).toFloat
      case (DoubleType, v: DoubleColumnVector) => v.vector(j)
      case (StringType, v: BytesColumnVector) =>
        new String(v.vector(j), v.start(j), v.length(j),
          java.nio.charset.StandardCharsets.UTF_8)
      case (BinaryType, v: BytesColumnVector) =>
        java.util.Arrays.copyOfRange(v.vector(j), v.start(j), v.start(j) + v.length(j))
      case (TimestampType, v: TimestampColumnVector) =>
        java.sql.Timestamp.from(instantOf(v, j))
      case (TimestampNTZType, v: TimestampColumnVector) =>
        java.time.LocalDateTime.ofInstant(instantOf(v, j), java.time.ZoneOffset.UTC)
      case (d: DecimalType, v: DecimalColumnVector) =>
        v.vector(j).getHiveDecimal.bigDecimalValue.setScale(d.scale)
      case (d: DecimalType, v: Decimal64ColumnVector) =>
        java.math.BigDecimal.valueOf(v.vector(j), d.scale)
      case (t, v) => throw new IllegalStateException(
        s"ORC data file $path: no spec decoding for vector class " +
          s"${v.getClass.getSimpleName} as ${t.sql} — unsupported")
    }
  }

  /** TimestampColumnVector slot → Instant: `time` is epoch millis,
    * `nanos` the full nanosecond-of-second (millis included), so the
    * second comes from a floor-div (pre-epoch safe) and the fraction
    * from `nanos` alone. */
  private def instantOf(v: TimestampColumnVector, j: Int): java.time.Instant =
    java.time.Instant.ofEpochSecond(
      java.lang.Math.floorDiv(v.time(j), 1000L), v.nanos(j).toLong)

}
