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
final class GraftIcebergSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg needs a table root: .load(\"/path/to/iceberg/table\")"))
    val snap = IcebergTable.snapshot(spark, root,
      parameters.get("snapshotId").map(_.toLong),
      parameters.get("asOfTimestampMs").map(_.toLong))
    GraftIcebergSource.relationFor(spark, root, snap)
  }
}

private[graft] object GraftIcebergSource {
  /** The batch relation both faces share (`format("graft-iceberg")`
    * and the catalog's SQL reads). */
  def relationFor(spark: SparkSession, root: String,
      snap: IcebergTable.IcebergSnapshot): BaseRelation =
    if (snap.deleteFiles.isEmpty && snap.dataFiles.nonEmpty) {
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      val index = new IcebergFileIndex(spark, root, snap)
      org.apache.spark.sql.execution.datasources.HadoopFsRelation(
        index, new StructType(), snap.schema, None,
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
        Map.empty)(spark)
    } else new FeedRelation(IcebergTable.readSnapshot(spark, root, snap))
}
