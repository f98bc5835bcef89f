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
    // atomic-ish swap (single-FS rename; on object stores use a manifest commit)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    nFiles
  }
}
