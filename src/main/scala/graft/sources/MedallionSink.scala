package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet lake writes — the capability surface of the
  * reference's Delta-on-MinIO layer (write modes, partition folders) plus
  * the small-file compaction its README flags as the streaming pain point
  * (reference: README.md "Writing a Kafka Stream to Delta Lake...").
  *
  * Scale: partition columns give the engine partition pruning on read;
  * `targetFileMb` sizes output files so a 1000-executor writer neither
  * floods the namenode with 1e6 tiny files nor serializes into one.
  */
object MedallionSink {

  /** Write `df` partitioned by `partitionBy` columns. */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Compact a (possibly fragmented) parquet dataset in place: rewrite
    * with file count chosen from total bytes / target file size — the
    * OPTIMIZE analog for streaming sinks that accreted small files. */
  def compact(spark: SparkSession, path: String, targetFileMb: Int = 128): Long = {
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1L, (bytes / (targetFileMb.toLong * 1024 * 1024)).toLong)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    df.repartition(nFiles.toInt).write.mode(SaveMode.Overwrite).parquet(tmp)
    // backup-swap, every step checked: the original is renamed aside (not
    // deleted) before the compacted data moves in, so no failure mode
    // loses the dataset — worst case the .bak rename is rolled back.
    // Readers racing the swap can glimpse the intermediate state; for
    // reader-safe atomic compaction use graft.sources.ManifestTable, whose
    // manifest commit never exposes a partial dataset.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_bak")
    if (fs.exists(bak)) require(fs.delete(bak, true), s"cannot clear stale backup $bak")
    require(fs.rename(dst, bak), s"cannot move $dst aside to $bak")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      require(fs.rename(bak, dst), s"compaction swap failed AND rollback failed for $dst")
      throw new IllegalStateException(s"compaction swap failed for $dst; original restored")
    }
    require(fs.delete(bak, true), s"compacted OK but cannot delete backup $bak")
    nFiles
  }
}
