package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Locally we run `local[32]`; on a cluster the same settings apply per the
  * brief: AQE handles runtime re-planning (coalescing post-shuffle
  * partitions, skew-join splitting), and broadcast joins are allowed up to
  * 64 MB so every TPC-H-style dimension table short-circuits its shuffle.
  */
object GraftSession {
  def builder(appName: String = "graft", master: String = "local[32]"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.sql.adaptive.coalescePartitions.enabled", true)
      .config("spark.sql.adaptive.skewJoin.enabled", true)
      // let AQE re-plan (coalesce) reads OVER cached relations: the
      // bounded-model persists (NgramLm/funnel lifecycles) otherwise pin
      // every downstream action to the cache's full shuffle-partition
      // fan-out — ~30 one-row tasks per model-sized action (SPARK-39915's
      // switch, off by default only for output-partitioning compat)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", true)
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .config("spark.sql.parquet.filterPushdown", true)
      // ObjectHashAggregate (collect_list/collect_set — every posting-list
      // build in the dedup suite) falls back to sort-based aggregation
      // after only 128 distinct groups per task (the OSS default), which
      // then spills the ENTIRE aggregation input through the external
      // sorter. Our list-valued groups are bounded by construction (df cap
      // => ≤ ~8 KB per posting), so 8192 in-memory groups is ≤ 64 MB of
      // per-task state — the fallback safety valve stays for true scale,
      // but stops firing at per-task group counts the hash map can hold.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 8192)
      // testdata events.ts is TIMESTAMP(NANOS); surface as long, convert in Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      // native vector_cosine + CosineFusionRule
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // SQL face: SELECT/INSERT/CREATE on graft.`/path` and graft.<name>
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
