package graft.sources

import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

/** `format("graft-iceberg")` — the idiomatic batch face of
  * [[IcebergTable]]: `spark.read.format("graft-iceberg").load(root)`
  * with `snapshotId` / `asOfTimestampMs` time-travel options.
  *
  * Registered under a collision-free name (registering as `iceberg`
  * would shadow iceberg-runtime on clusters that carry both). Delete-
  * free snapshots ride the [[IcebergFileIndex]]-backed stock parquet
  * relation — one scan, index-level file skipping from manifest bounds
  * and identity partition values, stock pushdown/codegen; snapshots
  * with v2 delete files serve the composed read (bitmap'd position
  * deletes + grouped equality deletes), which no longer fits a plain
  * file index. */
final class GraftIcebergSource extends RelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg needs a table root: .load(\"/path/to/iceberg/table\")"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = pathOf(parameters)
    parameters.get("metadata") match {
      case Some("snapshots") =>
        return new FeedRelation(IcebergTable.snapshotsTable(spark, root))
      case Some("history") =>
        return new FeedRelation(IcebergTable.history(spark, root))
      case Some("files") =>
        return new FeedRelation(IcebergTable.filesTable(spark, root))
      case Some(other) => throw new IllegalArgumentException(
        s"unknown graft-iceberg metadata table '$other' (snapshots, history, files)")
      case None => ()
    }
    val snapId = parameters.get("snapshotId").map(_.toLong)
    val asOfTs = parameters.get("asOfTimestampMs").map(_.toLong)
    if (parameters.get("readChangeFeed").exists(_.toBoolean)) {
      // batch CDF (Delta's table_changes analog): net changes over
      // (startingSequence, endingSequence], defaults = full history
      require(snapId.isEmpty && asOfTs.isEmpty,
        "readChangeFeed selects by sequence range — drop snapshotId/asOfTimestampMs " +
          "and use startingSequence/endingSequence")
      return new FeedRelation(IcebergTable.changelog(spark, root,
        parameters.get("startingSequence").map(_.toLong),
        parameters.get("endingSequence").map(_.toLong)))
    }
    val ls = IcebergTable.lazySnapshot(spark, root, snapId, asOfTs)
    // delete-carrying and name-mapped snapshots STILL resolve lazily
    // (r12): the composed read applies equality deletes through the
    // __seq scan column and renames through the coalesce projection, so
    // the data manifests never materialize on the driver; only a
    // live-entry-free snapshot takes the (trivially empty) eager read.
    // ONE lazyScanSchemas resolution serves every branch.
    IcebergTable.lazyScanSchemas(spark, ls) match {
      case None => GraftIcebergSource.relationFor(spark, root,
        IcebergTable.materialize(spark, ls))
      case Some(s) if ls.deleteFiles.isEmpty && s._4.isEmpty =>
        GraftIcebergSource.lazyRelationFrom(spark, root, ls, s)
      case Some(s) =>
        new FeedRelation(IcebergTable.readLazyFrom(spark, root, ls, s))
    }
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-iceberg reads the schema from the table metadata; drop .schema(...)")
    val src =
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        new IcebergChangelogStreamSource(sqlContext.sparkSession, pathOf(parameters))
      else new IcebergStreamSource(sqlContext.sparkSession, pathOf(parameters))
    (shortName(), src.schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    if (parameters.get("readChangeFeed").exists(_.toBoolean))
      new IcebergChangelogStreamSource(sqlContext.sparkSession, pathOf(parameters))
    else new IcebergStreamSource(sqlContext.sparkSession, pathOf(parameters),
      skipChangeCommits = parameters.get("skipChangeCommits").exists(_.toBoolean))
}

/** Structured-Streaming SOURCE over an existing Iceberg table —
  * `spark.readStream.format("graft-iceberg").load(path)`, the Iceberg
  * face of [[DeltaStreamSource]]. Offsets are SEQUENCE NUMBERS
  * (monotonic per the v2 spec; format v1 has none and fails loud). The
  * first batch is the full snapshot (v2 deletes applied); each later
  * batch `(a, b]` scans exactly the data files whose data sequence
  * number lands in the range — sequence inheritance makes that the
  * precise added-file set, with no per-version log diffing.
  *
  * Commits that change files without changing data — snapshots whose
  * summary declares `operation=replace` (compaction, the spec's
  * file-rewrite op) — are INVISIBLE: their added files are excluded
  * and their removals tolerated, the exact semantics Delta's
  * `dataChange=false` gives that source. A range that factually
  * commits delete files, or removes data files no replace snapshot
  * accounts for, fails loud (an append-only stream cannot represent
  * row removal) — unless `.option("skipChangeCommits", "true")`
  * (Delta's option, same name and meaning) opts into skipping those
  * commits wholesale: their adds, deletes and removals all ignored,
  * appends keep flowing. */
/** Shared face of the two `graft-iceberg` stream sources: v2
  * sequence-number offsets and the metadata-only schema probe — one
  * implementation, so the append-only and changelog faces can never
  * disagree on offset semantics. */
sealed abstract class IcebergStreamSourceBase(spark: SparkSession, root: String)
    extends org.apache.spark.sql.execution.streaming.Source {

  /** The table's row schema at the current snapshot, metadata-only;
    * fails loud on v1 (no sequence numbers to offset by). */
  protected final def tableSchema: StructType = {
    val ls = IcebergTable.lazySnapshot(spark, root)
    require(ls.formatVersion >= 2,
      s"streaming from $root needs Iceberg format v2 sequence numbers (table is v1)")
    StructType(ls.schema.fields.map(f =>
      org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable)))
  }

  override final def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] =
    IcebergTable.latestSeq(spark, root)
      .map(org.apache.spark.sql.execution.streaming.runtime.LongOffset(_))

  protected final def seqOf(o: org.apache.spark.sql.execution.streaming.Offset): Long =
    o match {
      case l: org.apache.spark.sql.execution.streaming.runtime.LongOffset => l.offset
      case other => other.json.trim.toLong
    }

  override def stop(): Unit = ()
}

final class IcebergStreamSource(spark: SparkSession, root: String,
    skipChangeCommits: Boolean = false)
    extends IcebergStreamSourceBase(spark, root) {

  override val schema: StructType = tableSchema

  override def getBatch(start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset)
      : org.apache.spark.sql.DataFrame = {
    val endSeq = seqOf(end)
    val endLs = IcebergTable.lazySnapshot(spark, root,
      Some(IcebergTable.snapshotIdAtSeq(spark, root, endSeq)))
    val frame = start.map(seqOf) match {
      case None =>
        // first batch = the full snapshot, lazily — deletes included
        // (r12): manifests parse on executors either way
        IcebergTable.readLazy(spark, root, endLs).getOrElse(
          IcebergTable.readSnapshot(spark, root,
            IcebergTable.materialize(spark, endLs)))
      case Some(a) =>
        val seqOps = IcebergTable.snapshotSeqOps(spark, root)
          .filter { case (s, _) => s > a && s <= endSeq }.toMap
        // replace = the spec's no-data-change file rewrite: always
        // invisible. Other non-append ops are skippable only by opt-in.
        val replaceSeqs = seqOps.filter(_._2 == "replace").keySet
        val changeOpSeqs = seqOps.filter { case (_, op) =>
          op != "append" && op != "replace"
        }.keySet
        // delete files are attributable by FACT (they carry their seq)
        val deleteFactSeqs = endLs.deleteFiles
          .filter(f => f.seq > a && f.seq <= endSeq).map(_.seq).toSet
        val excluded = replaceSeqs ++
          (if (skipChangeCommits) changeOpSeqs ++ deleteFactSeqs else Set.empty[Long])
        val offending = deleteFactSeqs -- excluded
        if (offending.nonEmpty) throw new UnsupportedOperationException(
          s"Iceberg range ($a, $endSeq] of $root commits delete files — an append-only " +
            "stream cannot represent row removal; process that change out-of-band (e.g. " +
            "IcebergTable.changelog) and restart from a fresh checkpoint, or skip such " +
            "commits wholesale with .option(\"skipChangeCommits\", \"true\")")
        // manifests are IMMUTABLE, so the per-trigger diff is
        // MANIFEST-level (r11): entries with seq > a can only live in
        // manifests the end list added since `a`, and file removals can
        // only hide in manifests the end list dropped — both sets are
        // bounded by the range's churn, so a trigger's driver cost
        // tracks the commits it serves, never the table
        val priorLs = IcebergTable.lazySnapshot(spark, root,
          Some(IcebergTable.snapshotIdAtSeq(spark, root, a)))
        val priorSet = priorLs.dataManifests.map(_._1).toSet
        val endSet = endLs.dataManifests.map(_._1).toSet
        val dropped = priorLs.dataManifests.filterNot(m => endSet.contains(m._1))
        val fresh = endLs.dataManifests.filterNot(m => priorSet.contains(m._1))
        val conf = spark.sparkContext.hadoopConfiguration
        val base = root.stripSuffix("/")
        def entriesOf(ms: Seq[(String, Int, Long)], withStats: Boolean) =
          ms.flatMap { case (p, c, q) =>
            val (data, dels) = IcebergTable.parseManifest(conf, base, p, c, q, withStats)
            // mirror pruneDataManifests: a content=0 manifest carrying
            // delete entries is a nonconforming writer — failing loud
            // here keeps those deletes from silently resurrecting rows
            // in the stream (only the manifest LIST's content routes us)
            if (c == 0 && dels.nonEmpty) throw new IllegalStateException(
              s"data manifest $p carries ${dels.size} delete entr(ies) — nonconforming " +
                "writer; the append-only stream would silently drop them")
            data
          }
        val removed: Set[String] =
          if (dropped.isEmpty) Set.empty
          else entriesOf(dropped, withStats = false).map(_.path).toSet --
            entriesOf(fresh, withStats = false).map(_.path).toSet
        // removals are fine iff every snapshot that can remove files in
        // this range is excluded (replace, or opted-out change commits);
        // otherwise — or when no snapshot's op accounts for them at all —
        // fail loud rather than mis-stream
        val removers = replaceSeqs ++ changeOpSeqs
        if (removed.nonEmpty && (removers.isEmpty || (removers -- excluded).nonEmpty))
          throw new UnsupportedOperationException(
            s"Iceberg range ($a, $endSeq] of $root removed ${removed.size} data file(s) " +
              "(delete or overwrite) — an append-only stream cannot represent that; " +
              "process the change out-of-band (IcebergTable.changelog) and restart from " +
              "a fresh checkpoint, or skip such commits with " +
              ".option(\"skipChangeCommits\", \"true\")")
        val added = entriesOf(fresh, withStats = true)
          .filter(f => f.seq > a && !excluded.contains(f.seq))
        if (added.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else IcebergTable.readSnapshot(spark, root,
          IcebergTable.IcebergSnapshot(endLs.snapshotId, endLs.timestampMs,
            endLs.formatVersion, endLs.schema, endLs.partitionFields, added, Nil,
            endLs.nameMapping))
    }
    org.apache.spark.sql.GraftSqlBridge.streamingFrame(
      frame.select(schema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*))
  }
}

/** Structured-Streaming CHANGELOG source over an Iceberg table —
  * `.option("readChangeFeed", "true")`, the Iceberg face of Delta's
  * streaming CDF: each batch `(a, b]` emits
  * [[IcebergTable.changelog]]'s net row changes for the range — table
  * rows + `_change_type` (`insert`/`delete`) + `_commit_seq` — so a
  * producer-side DELETE or overwrite flows as delete rows instead of
  * bricking the stream, and compaction (`replace`) snapshots emit
  * nothing. The first batch is the table's full history from sequence
  * 0 (all-insert when the table only ever appended); offsets are v2
  * sequence numbers like the append-only source. */
final class IcebergChangelogStreamSource(spark: SparkSession, root: String)
    extends IcebergStreamSourceBase(spark, root) {

  override val schema: StructType = tableSchema
    .add("_change_type", org.apache.spark.sql.types.StringType)
    .add("_commit_seq", org.apache.spark.sql.types.LongType)

  override def getBatch(start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset)
      : org.apache.spark.sql.DataFrame = {
    val endSeq = seqOf(end)
    val from = start.map(seqOf).getOrElse(0L)
    val frame = IcebergTable.changelog(spark, root, Some(from), Some(endSeq))
    org.apache.spark.sql.GraftSqlBridge.streamingFrame(
      frame.select(schema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*))
  }
}

private[graft] object GraftIcebergSource {
  /** The batch relation both faces share (`format("graft-iceberg")`
    * and the catalog's SQL reads). */
  def relationFor(spark: SparkSession, root: String,
      snap: IcebergTable.IcebergSnapshot): BaseRelation =
    // AVRO-bearing snapshots (r15) take the composed-read relation:
    // readSnapshot unions the Avro-core leg with the parquet scan
    if (snap.deleteFiles.isEmpty && snap.dataFiles.nonEmpty &&
        snap.dataFiles.forall(_.format.equalsIgnoreCase("PARQUET"))) {
      IcebergTable.scanSchemas(spark, snap) match {
        case (dataSchema, partSchema, scanOptions, None) =>
          val index = new IcebergFileIndex(spark, root, snap, partSchema)
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            index, partSchema, dataSchema, None,
            new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
            scanOptions)(spark)
        case _ => // name-mapped files need the coalesce projection
          new FeedRelation(IcebergTable.readSnapshot(spark, root, snap))
      }
    } else new FeedRelation(IcebergTable.readSnapshot(spark, root, snap))

  /** Same relation over a [[IcebergTable.LazyIcebergSnapshot]] —
    * manifests stay unread; [[IcebergFileIndex.listFiles]] ships the
    * pushed filters to executors (r11). Takes the ONE
    * `lazyScanSchemas` resolution the caller already paid for (so the
    * delete-carrying / name-mapped fallbacks never re-parse manifests
    * or re-open footers); delete-free, projection-free snapshots
    * only. */
  def lazyRelationFrom(spark: SparkSession, root: String,
      ls: IcebergTable.LazyIcebergSnapshot,
      schemas: (org.apache.spark.sql.types.StructType,
        org.apache.spark.sql.types.StructType, Map[String, String],
        IcebergTable.MappedProjection))
      : org.apache.spark.sql.execution.datasources.HadoopFsRelation = {
    require(ls.deleteFiles.isEmpty,
      s"lazy Iceberg scan over $root cannot honor delete files — use IcebergTable.read")
    val (dataSchema, partSchema, scanOptions, project) = schemas
    require(project.isEmpty,
      s"name-mapped table at $root needs the coalesce projection — use IcebergTable.readLazy")
    val index = new IcebergFileIndex(spark, root, ls, partSchema)
    org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, partSchema, dataSchema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      scanOptions)(spark)
  }
}
