package graft.sources

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming SOURCE over an existing Delta lake —
  * `spark.readStream.format("graft-delta").load(path)`. The reference's
  * pipeline streams INTO Delta silver
  * (pipeline/data_ingestion/spark_structured_datastream.py:75-79;
  * load_data_task.py:142); this is how a graft user streams OUT of that
  * same lake incrementally, without Delta on the classpath.
  *
  * Offsets are Delta versions (listing-only probe, no replay per
  * trigger). The first batch is the full snapshot at the stream's first
  * observed version; each later batch `(a, b]` scans exactly the files
  * commits `a+1..b` added with `dataChange=true` — compaction rewrites
  * (`dataChange=false`) are invisible, and a commit that removed data
  * files or attached a deletion vector fails loud (an append-only
  * stream cannot represent row removal; Delta's own source rejects the
  * same way). Schema / partition layout / column mapping come from the
  * END version's snapshot, so batches read exactly like [[DeltaLake
  * .read]] restricted to the new files.
  *
  * Registered under the collision-free name `graft-delta` (registering
  * `delta` itself would make `format("delta")` ambiguous on clusters
  * that also carry delta-spark). */
final class DeltaStreamSource(spark: SparkSession, root: String) extends Source {

  override val schema: StructType = DeltaLake.lazySnapshot(spark, root) match {
    case Right(ls) => DeltaLake.outputSchemaOf(ls.schema)
    case Left(snap) => DeltaLake.outputSchema(snap)
  }

  override def getOffset: Option[Offset] =
    DeltaLake.latestVersion(spark, root).map(LongOffset(_))

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    val cols = schema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col)
    val frame = (start.map(versionOf), DeltaLake.lazySnapshot(spark, root, Some(endV))) match {
      // first batch over a checkpointed DV-free snapshot: the lazy
      // relation — checkpoint adds stay columnar, never driver-resident
      case (None, Right(ls)) =>
        GraftSqlBridge.ofRows(spark,
          org.apache.spark.sql.execution.datasources.LogicalRelation(
            GraftDeltaSource.lazyRelationFor(spark, root, ls)))
      case (None, Left(snap)) =>
        DeltaLake.readEntries(spark, root, snap, snap.files)
      // incremental batch: the JSON tail names the batch's files; the
      // lazy snapshot supplies schema/layout without materializing adds
      case (Some(a), Right(ls)) =>
        val entries = DeltaLake.addedBetween(spark, root, a, endV)
        DeltaLake.readEntries(spark, root, DeltaLake.DeltaSnapshot(
          ls.version, ls.schema, ls.partitionColumns, entries,
          columnMapping = false, ls.readerFeatures), entries)
      case (Some(a), Left(snap)) =>
        DeltaLake.readEntries(spark, root, snap,
          DeltaLake.addedBetween(spark, root, a, endV))
    }
    // per-partition-group union (+ mapping translation) — re-tag streaming
    GraftSqlBridge.streamingFrame(frame.select(cols: _*))
  }

  override def stop(): Unit = ()
}

/** `format("graft-delta")` — the batch + streaming faces of
  * [[DeltaLake]]. Batch reads ride a [[DeltaFileIndex]]-backed stock
  * parquet relation (one scan, log-sourced partition values, pruning at
  * the index, `versionAsOf` option); column-mapped or deletion-vectored
  * snapshots fail loud naming [[DeltaLake.read]], which handles both. */
final class GraftDeltaSource extends StreamSourceProvider
    with org.apache.spark.sql.sources.RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta needs a table root: .load(\"/path/to/delta/table\")"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): org.apache.spark.sql.sources.BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = pathOf(parameters)
    DeltaLake.lazySnapshot(spark, root, parameters.get("versionAsOf").map(_.toLong)) match {
      case Right(ls) => GraftDeltaSource.lazyRelationFor(spark, root, ls)
      case Left(snap) => GraftDeltaSource.relationFor(spark, root, snap)
    }
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-delta reads the schema from the Delta log; drop .schema(...)")
    (shortName(), DeltaLake.lazySnapshot(sqlContext.sparkSession, pathOf(parameters)) match {
      case Right(ls) => DeltaLake.outputSchemaOf(ls.schema)
      case Left(snap) => DeltaLake.outputSchema(snap)
    })
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaStreamSource(sqlContext.sparkSession, pathOf(parameters))
}

private[graft] object GraftDeltaSource {
  /** The [[DeltaFileIndex]]-backed batch relation both faces share
    * (`format("graft-delta")` reads and the catalog's SQL reads). */
  def relationFor(spark: SparkSession, root: String,
      snap: DeltaLake.DeltaSnapshot): org.apache.spark.sql.execution.datasources.HadoopFsRelation = {
    val index = new DeltaFileIndex(spark, root, snap)
    wrap(spark, index)
  }

  /** Same relation over a [[DeltaLake.LazySnapshot]] — checkpoint adds
    * stay columnar; [[DeltaFileIndex.listFiles]] prunes distributed. */
  def lazyRelationFor(spark: SparkSession, root: String,
      ls: DeltaLake.LazySnapshot): org.apache.spark.sql.execution.datasources.HadoopFsRelation = {
    val index = new DeltaFileIndex(spark, root, ls)
    wrap(spark, index)
  }

  private def wrap(spark: SparkSession, index: DeltaFileIndex) =
    org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, index.partitionSchema, index.dataSchema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      Map.empty)(spark)
}
