package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All registered operators, each with a Spark plan builder and (when
    * SQL-expressible) a DuckDB oracle. */
  def allDefs: Seq[QueryDef] =
    Etl.queries ++ TableLifecycle.queries ++ Analytics.queries ++ AnalyticsSubqueries.queries ++
      Profiler.queries ++ QualityChecks.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ graft.streaming.EventStream.queries ++
      graft.sources.GhArchiveSource.queries

  /** The events table carries parquet TIMESTAMP(NANOS); make any caller's
    * session able to read it regardless of how it was built. Also plants
    * the TopKPerKey planner strategy via `experimental.extraStrategies`
    * so queries built on the custom operator plan even on a session that
    * was NOT created with graft's SparkSessionExtensions. Idempotent. */
  private def prepare(spark: SparkSession): SparkSession = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    spark
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Etl.dimEnrichment(Tables(prepare(spark), "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> ((s: SparkSession, dir: String) => d.build(Tables(prepare(s), dir)))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Corpus-scale stage explainers for EAGER keys (r18 — see
    * [[QueryDef.stages]]): for each registered key whose result frame
    * hides its corpus-scale plans behind imperative execution, calls
    * `f(stageName, frame)` per stage. PlanSnapshot records these as
    * `key#stage` rows; PlanGuardSpec budgets them like any query. */
  def explainStages(name: String, spark: SparkSession, dir: String)(
      f: (String, DataFrame) => Unit): Unit =
    allDefs.find(_.name == name).flatMap(_.stages)
      .foreach(s => s(Tables(prepare(spark), dir), f))

  /** The keys carrying a stage seam. */
  def stagedKeys: Set[String] = allDefs.filter(_.stages.isDefined).map(_.name).toSet
}
