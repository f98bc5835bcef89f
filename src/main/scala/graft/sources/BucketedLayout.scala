package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located-join tool for fact⋈fact joins.
  *
  * Writing both join sides bucketed (and sorted) by the join key lets
  * Spark plan a SortMergeJoin with NO Exchange on either side: at 100 TB,
  * orders⋈lineitem on orderkey stops moving ~both tables over the network
  * every query and becomes a per-bucket local merge. Bucket count should
  * be sized so a bucket of the larger table fits an executor's memory
  * (e.g. 100 TB / 4096 buckets ≈ 25 GB... pick 2-4× finer).
  */
object BucketedLayout {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans a shuffle-free
    * SortMergeJoin when both sides share the bucket spec. The merge hint
    * reflects the fact-⋈-fact reality: at the scales bucketing exists for,
    * neither side broadcasts. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right).hint("merge"), key)
}
