package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets
import java.util.UUID

/** Minimal ACID table format: versioned manifest commits over parquet —
  * the in-sandbox answer to the reference's Delta-on-MinIO layer
  * (reference: pipeline/data_ingestion/spark_structured_datastream.py:75-79,
  * pipeline/airflow/dags/load_data_task.py:117-145).
  *
  * Layout:
  * {{{
  *   <root>/data/<uuid>-part-*.parquet     data files (never mutated)
  *   <root>/_manifests/v<0-padded>.manifest one relative path per line,
  *                                         plus `# txn:<appId>:<batch>`
  *                                         writer high-water marks
  *   <root>/_staging/<uuid>/               writer scratch, pre-commit
  * }}}
  *
  * Protocol: writers stage data files first (readers never list `data/`,
  * so uncommitted files are invisible), then commit by renaming a fully
  * written temp manifest to `v<N+1>.manifest`. The rename is the single
  * commit point: it either lands or it doesn't, so a writer killed at ANY
  * step leaves the last committed snapshot intact — compaction included.
  * Concurrent committers race on the rename (Hadoop rename fails if the
  * destination exists); the loser re-reads the new snapshot and retries,
  * so no committed files are ever dropped from the lineage.
  *
  * Readers resolve max version under `_manifests/` and load exactly the
  * listed files — a consistent snapshot regardless of in-flight writes;
  * `version = Some(n)` gives time travel until `vacuum` reclaims n.
  *
  * Scale: the manifest write is O(#files) driver-side metadata, not a data
  * move — compaction commits 100 TB by renaming one small file. On HDFS
  * and POSIX the no-overwrite rename is atomic; on S3-class object stores
  * swap it for a conditional PUT (If-None-Match) — the sole primitive the
  * protocol needs.
  */
object ManifestTable {

  private val ManifestDir = "_manifests"
  private val DataDir = "data"
  private val StagingDir = "_staging"
  private val MaxCommitRetries = 16

  /** Set to `true` to commit anyway on a store whose rename is not atomic
    * (you have brought your own mutual exclusion, e.g. a single writer or
    * an external lock service). */
  val AllowNonAtomicKey = "spark.graft.manifest.allowNonAtomicCommit"

  // rename is copy+delete (or exists() is eventually consistent) on these:
  // two racing committers could both "win" and one commit's files would
  // silently drop from the lineage
  private val NonAtomicRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss", "swift", "cos")

  /** The commit protocol's single assumption is rename-without-overwrite
    * atomicity; detect at runtime the stores known to break it instead of
    * silently corrupting lineage under concurrency. */
  private def checkCommitScheme(spark: SparkSession, root: String): Unit = {
    val scheme = Option(new java.net.URI(root).getScheme).getOrElse("file").toLowerCase
    if (NonAtomicRenameSchemes.contains(scheme) &&
        !spark.conf.get(AllowNonAtomicKey, "false").toBoolean)
      throw new IllegalStateException(
        s"$scheme:// rename is not atomic — concurrent ManifestTable commits can drop files " +
          s"from the lineage. Use a conditional-PUT committer for this store, or set " +
          s"$AllowNonAtomicKey=true if an external mechanism guarantees a single writer.")
  }

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long) =
    new Path(s"${root.stripSuffix("/")}/$ManifestDir/v${"%020d".format(v)}.manifest")

  private def parseVersion(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".manifest"))
      name.stripPrefix("v").stripSuffix(".manifest").toLongOption
    else None

  /** Latest committed version, or None for an empty/uninitialized table. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsFor(spark, root)
    val dir = new Path(s"${root.stripSuffix("/")}/$ManifestDir")
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .flatMap(s => parseVersion(s.getPath.getName))
      .maxOption
  }

  /** Writer-transaction marker lines: `# txn:<appId>:<maxBatchId>` — the
    * Delta `txn` action's shape: one monotonically-advancing high-water
    * mark per streaming writer, carried forward by every commit, bounded
    * by the number of writers (not the number of batches). */
  private val TxnPrefix = "# txn:"

  /** Table-schema marker line: `# schema:<StructType json>` — the Delta
    * `metaData` action's shape, carried forward by every commit so a
    * version whose file list is empty (overwrite with an empty frame, an
    * empty first micro-batch) still reads as a typed empty table. */
  private val SchemaPrefix = "# schema:"

  private def listedLines(fs: FileSystem, root: String, v: Long): Seq[String] = {
    val in = fs.open(manifestPath(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Relative data-file paths committed at `v`. */
  private def listedFiles(fs: FileSystem, root: String, v: Long): Seq[String] =
    listedLines(fs, root, v).filterNot(_.startsWith("#"))

  private def parseTxns(lines: Seq[String]): Map[String, Long] =
    lines.collect {
      case l if l.startsWith(TxnPrefix) =>
        val body = l.stripPrefix(TxnPrefix)
        val cut = body.lastIndexOf(':')
        body.substring(0, cut) -> body.substring(cut + 1).toLong
    }.toMap

  private def parseSchema(lines: Seq[String]): Option[String] =
    lines.collectFirst {
      case l if l.startsWith(SchemaPrefix) => l.stripPrefix(SchemaPrefix)
    }

  /** Per-writer batch high-water marks committed at `v`. */
  private def listedTxns(fs: FileSystem, root: String, v: Long): Map[String, Long] =
    parseTxns(listedLines(fs, root, v))

  /** Committed table schema at `v` (absent only in pre-schema manifests). */
  private def listedSchema(fs: FileSystem, root: String, v: Long): Option[String] =
    parseSchema(listedLines(fs, root, v))

  /** Snapshot read at the latest (or an explicit) version. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val fs = fsFor(spark, root)
    val files = listedFiles(fs, root, v).map(rel => s"${root.stripSuffix("/")}/$rel")
    if (files.nonEmpty) spark.read.parquet(files: _*)
    else listedSchema(fs, root, v) match {
      // a legitimate empty snapshot: typed empty frame, not a parquet
      // schema-inference crash over zero paths
      case Some(json) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      case None => throw new IllegalStateException(
        s"version $v at $root lists no data files and carries no schema line")
    }
  }

  /** Stage `df` as parquet under `data/` with a commit-unique prefix;
    * returns the relative paths. Invisible to readers until committed. */
  private def stage(spark: SparkSession, root: String, df: DataFrame): Seq[String] = {
    checkCommitScheme(spark, root) // fail before moving data, not at commit
    val fs = fsFor(spark, root)
    val tag = UUID.randomUUID().toString.take(8)
    val scratch = new Path(s"${root.stripSuffix("/")}/$StagingDir/$tag")
    df.write.parquet(scratch.toString)
    val dataDir = new Path(s"${root.stripSuffix("/")}/$DataDir")
    fs.mkdirs(dataDir)
    val moved = fs.listStatus(scratch).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val dst = new Path(dataDir, s"$tag-${st.getPath.getName}")
        require(fs.rename(st.getPath, dst), s"cannot move staged file ${st.getPath} to $dst")
        s"$DataDir/${dst.getName}"
      }
    fs.delete(scratch, true)
    moved
  }

  /** Atomically publish `files` as version `v`. The temp manifest is fully
    * written and closed before the rename, so readers can never observe a
    * torn manifest; rename-without-overwrite loses cleanly to a concurrent
    * committer. */
  private def tryCommit(fs: FileSystem, root: String, v: Long, files: Seq[String],
      txns: Map[String, Long] = Map.empty, schemaJson: Option[String] = None): Boolean = {
    val target = manifestPath(root, v)
    val tmp = new Path(target.getParent, s".tmp-${UUID.randomUUID()}")
    fs.mkdirs(target.getParent)
    val txnLines = txns.toSeq.sortBy(_._1).map { case (a, b) => s"$TxnPrefix$a:$b" }
    val schemaLines = schemaJson.map(SchemaPrefix + _).toSeq
    val out = fs.create(tmp, false)
    try out.write(((schemaLines ++ files ++ txnLines).mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // HDFS rename-without-overwrite is the atomic arbiter. The local FS
    // delegates to POSIX rename (silent overwrite), so the exists() guard
    // carries exclusivity there — single-writer semantics, test-grade only.
    if (fs.exists(target)) { fs.delete(tmp, false); false }
    else if (fs.rename(tmp, target)) true
    else { fs.delete(tmp, false); false }
  }

  /** Commit with retry: `next(baseFiles)` computes the new file list from
    * the freshest snapshot, so a losing racer never drops the winner's
    * files. Returns the committed version. */
  private def commit(spark: SparkSession, root: String, schema: Option[String])(
      next: Seq[String] => Seq[String]): Long =
    commitTxn(spark, root, schema) { (files, txns) => Some((next(files), txns)) }.get

  /** Like [[commit]] but the closure also sees/updates the per-writer txn
    * marks and may return None to abort as already-applied (idempotent
    * replay). The closure runs against the FRESHEST snapshot on every
    * retry, so its dedup decision is race-safe. */
  private def commitTxn(spark: SparkSession, root: String, schema: Option[String] = None)(
      next: (Seq[String], Map[String, Long]) => Option[(Seq[String], Map[String, Long])]): Option[Long] = {
    checkCommitScheme(spark, root)
    val fs = fsFor(spark, root)
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val base = currentVersion(spark, root)
      // ONE manifest read per attempt; files/txns/schema parse from it
      val baseLines = base.map(listedLines(fs, root, _)).getOrElse(Nil)
      val baseFiles = baseLines.filterNot(_.startsWith("#"))
      val baseTxns = parseTxns(baseLines)
      // this commit's schema if it brings one, else carried forward
      val schemaJson = schema.orElse(parseSchema(baseLines))
      val v = base.getOrElse(0L) + 1
      next(baseFiles, baseTxns) match {
        case None => return None
        case Some((files, txns)) =>
          if (tryCommit(fs, root, v, files, txns, schemaJson)) return Some(v)
      }
      attempt += 1
    }
    throw new IllegalStateException(s"commit lost $MaxCommitRetries races at $root")
  }

  /** Exactly-once streaming append (the Delta `txn` pattern): commits `df`
    * together with writer `appId`'s new batch high-water mark in ONE
    * manifest rename — data and dedup mark cannot diverge, unlike a
    * side-ledger. A replayed or out-of-order micro-batch (batchId ≤ the
    * committed mark) stages, sees the mark at commit time, aborts, and
    * removes its staged files — every crash interleaving converges to the
    * batch appearing exactly once. Returns None for such skips. */
  def exactlyOnceAppend(spark: SparkSession, root: String, df: DataFrame,
      appId: String, batchId: Long): Option[Long] = {
    val fs = fsFor(spark, root)
    val already = currentVersion(spark, root)
      .exists(v => listedTxns(fs, root, v).get(appId).exists(batchId <= _))
    if (already) return None // cheap pre-check: skip without staging
    val staged = stage(spark, root, df)
    val committed = commitTxn(spark, root, Some(df.schema.json)) { (files, txns) =>
      if (txns.get(appId).exists(batchId <= _)) None
      else Some((files ++ staged, txns + (appId -> batchId)))
    }
    if (committed.isEmpty)
      staged.foreach(rel => fs.delete(new Path(s"${root.stripSuffix("/")}/$rel"), false))
    committed
  }

  /** `foreachBatch` adapter over [[exactlyOnceAppend]]. */
  def exactlyOnceWriter(root: String, appId: String): (DataFrame, Long) => Unit =
    (df, batchId) => { exactlyOnceAppend(df.sparkSession, root, df, appId, batchId); () }

  /** Append `df` as a new version; returns the committed version. */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    val staged = stage(spark, root, df)
    commit(spark, root, Some(df.schema.json))(base => base ++ staged)
  }

  /** Replace the table contents with `df` (single-version overwrite). */
  def overwrite(spark: SparkSession, root: String, df: DataFrame): Long = {
    val staged = stage(spark, root, df)
    commit(spark, root, Some(df.schema.json))(_ => staged)
  }

  /** Compact the current snapshot into ~targetFileMb files and commit the
    * rewrite as one manifest rename. Readers of older versions keep their
    * snapshot until [[vacuum]]; a writer killed before the commit leaves
    * only unreferenced staging/data files, never a partial table. */
  def compact(spark: SparkSession, root: String, targetFileMb: Int = 128): Long = {
    val df = read(spark, root)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1L, (bytes / (targetFileMb.toLong * 1024 * 1024)).toLong)
    val staged = stage(spark, root, df.repartition(nFiles.toInt))
    commit(spark, root, Some(df.schema.json))(_ => staged)
  }

  /** Reclaim storage: drop all but the newest `keepVersions` manifests and
    * delete any unreferenced data/staging file OLDER than `minAgeMs`.
    *
    * The age threshold is the concurrency guard (Delta's retention check):
    * a writer that has staged or moved files into `data/` but not yet
    * committed its manifest holds files that are unreferenced-but-live —
    * deleting them would let its imminent commit publish a version that
    * points at nothing. Files younger than `minAgeMs` are therefore kept
    * regardless of references; set it comfortably above the longest
    * stage→commit window (default 10 min). `minAgeMs = 0` is for
    * single-writer/test use only. Returns the number of deleted data
    * files. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 1,
      minAgeMs: Long = 600000L): Int = {
    require(keepVersions >= 1, "must keep at least the current version")
    val fs = fsFor(spark, root)
    val base = root.stripSuffix("/")
    val cutoff = System.currentTimeMillis() - minAgeMs
    val versions = {
      val dir = new Path(s"$base/$ManifestDir")
      if (!fs.exists(dir)) return 0
      fs.listStatus(dir).toSeq.flatMap(s => parseVersion(s.getPath.getName)).sorted
    }
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepVersions))
    val live = keep.flatMap(listedFiles(fs, base, _)).toSet
    drop.foreach(v => fs.delete(manifestPath(base, v), false))
    val dataDir = new Path(s"$base/$DataDir")
    val removed =
      if (!fs.exists(dataDir)) 0
      else fs.listStatus(dataDir).toSeq.count { st =>
        val rel = s"$DataDir/${st.getPath.getName}"
        !live.contains(rel) && st.getModificationTime < cutoff && fs.delete(st.getPath, false)
      }
    // staging scratch: only abandoned writer dirs. Age = the NEWEST mtime
    // in the scratch tree, not the dir's own — a directory's mtime stays
    // at creation while Spark writes into its _temporary subtree, so a
    // long in-flight stage would otherwise look abandoned mid-write.
    val stagingDir = new Path(s"$base/$StagingDir")
    if (fs.exists(stagingDir))
      fs.listStatus(stagingDir).toSeq
        .filter(st => newestMtime(fs, st.getPath) < cutoff)
        .foreach(st => fs.delete(st.getPath, true))
    removed
  }

  private def newestMtime(fs: FileSystem, p: Path): Long = {
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) st.getModificationTime
    else (st.getModificationTime +: fs.listStatus(p).toSeq.map(c => newestMtime(fs, c.getPath))).max
  }
}
