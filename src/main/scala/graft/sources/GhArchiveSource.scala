package graft.sources

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GH-Archive event ingestion — the reference's bronze→silver→gold path
  * (reference: pipeline/schema.py:11, pipeline/airflow/dags/
  * load_data_task.py:93-191) as a typed Spark source.
  *
  * Scale: JSON parsing with an explicit schema is a narrow map — no
  * inference scan; 100 TB of hourly archives parallelize by file. The
  * dimension extraction is `distinct` on narrow projections (shuffle keyed
  * on the dim's natural key); the flattened fact never shuffles.
  */
object GhArchiveSource {

  private val actorType = StructType(Seq(
    StructField("id", LongType),
    StructField("login", StringType),
    StructField("gravatar_id", StringType),
    StructField("avatar_url", StringType),
    StructField("url", StringType)))

  /** Explicit event schema (all nullable: parquet/Delta round-trips force
    * nullability anyway — the gotcha the reference README documents). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("other", StringType),
    StructField("created_at", StringType),
    StructField("type", StringType),
    StructField("public", BooleanType),
    StructField("repo", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("url", StringType)))),
    StructField("actor", actorType),
    StructField("org", actorType),
    StructField("payload", StringType)))

  /** Bronze → silver: schema-checked JSON read, freeform fields dropped,
    * timestamp normalized. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .json(path)
      .drop("payload", "other")
      .withColumn("created_at", to_timestamp(col("created_at"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))

  /** Result of a dead-letter read; call [[DeadLetterRead.release]] once
    * both frames are consumed to drop the shared parse cache. */
  final case class DeadLetterRead(good: DataFrame, bad: DataFrame, private val parsed: DataFrame) {
    def release(): Unit = { parsed.unpersist(); () }
  }

  /** Bronze read with failed-message capture — the reference roadmap's
    * "handle duplicated events, failured messages" item (reference:
    * README.md "Further actions" §2). PERMISSIVE parse routes unparseable
    * lines into a corrupt-record column; returns (good, bad) frames so the
    * pipeline can dead-letter the bad ones instead of dying mid-load. The
    * parse is cached (required for corrupt-column-only queries and shared
    * by both branches) — release() it when done. */
  def readJsonWithDeadLetter(spark: SparkSession, path: String): DeadLetterRead = {
    val withCorrupt = spark.read
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val bad = withCorrupt.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    val good = withCorrupt.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record", "payload", "other")
      .withColumn("created_at", to_timestamp(col("created_at"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    DeadLetterRead(good, bad, withCorrupt)
  }

  /** Deterministic synthetic GH-Archive events in the nested silver shape
    * — scale-testing fuel for the dims pipeline without network access
    * (≅ the reference's fake-data generator, batch form). Cardinalities:
    * `n` events over n/10 actors, n/20 repos; orgs cycle over n/100 ids
    * but 20% of events are org-less (id % 5 == 0), and since 5 divides
    * the org cardinality those org ids never surface — expect 0.8·(n/100)
    * distinct orgs. */
  def synthetic(spark: SparkSession, n: Long): DataFrame = {
    val actorId = pmod(col("id"), lit(math.max(1L, n / 10)))
    val repoId = pmod(col("id"), lit(math.max(1L, n / 20)))
    val orgId = pmod(col("id"), lit(math.max(1L, n / 100)))
    spark.range(n).select(
      col("id").cast("string").as("id"),
      timestamp_add("SECOND", pmod(col("id"), lit(3600)),
        to_timestamp(lit("2015-01-01 15:00:00"))).as("created_at"),
      element_at(array(lit("PushEvent"), lit("WatchEvent"), lit("ForkEvent"), lit("IssuesEvent")),
        (pmod(col("id"), lit(4)) + 1).cast("int")).as("type"),
      (pmod(col("id"), lit(10)) =!= 0).as("public"),
      struct(
        repoId.as("id"),
        concat(lit("repo-"), repoId).as("name"),
        concat(lit("http://api/repos/"), repoId).as("url")).as("repo"),
      struct(
        actorId.as("id"),
        concat(lit("user-"), actorId).as("login"),
        lit("").as("gravatar_id"),
        concat(lit("http://a/"), actorId).as("avatar_url"),
        concat(lit("http://api/users/"), actorId).as("url")).as("actor"),
      when(pmod(col("id"), lit(5)) === 0, lit(null)).otherwise(
        struct(
          orgId.as("id"),
          concat(lit("org-"), orgId).as("login"),
          lit("").as("gravatar_id"),
          concat(lit("http://a/o"), orgId).as("avatar_url"),
          concat(lit("http://api/orgs/"), orgId).as("url"))).as("org"))
  }

  /** Gold dimensions + flattened fact from a silver frame. */
  def users(silver: DataFrame): DataFrame = silver.select(col("actor.*")).distinct()
  def repos(silver: DataFrame): DataFrame = silver.select(col("repo.*")).distinct()
  // drop only the all-null rows produced by absent org structs — the
  // reference's bare na.drop() (load_data_task.py:191) also discards real
  // orgs missing a single optional field (gravatar_id etc.), breaking
  // org_id foreign keys in the events fact
  def organizations(silver: DataFrame): DataFrame =
    silver.select(col("org.*")).distinct().na.drop("all")

  def events(silver: DataFrame): DataFrame =
    silver.select(
      col("actor.id").as("actor_id"),
      col("org.id").as("org_id"),
      col("id"),
      col("created_at"),
      col("type"),
      col("public"),
      col("repo.id").as("repo_id"),
      col("repo.name").as("repo_name"),
      col("repo.url").as("repo_url"))

  /** Event count for the oracle-verified gold-dim queries below. The
    * synthetic silver is a pure function of `range(SyntheticN)`, so the
    * DuckDB oracle reproduces it from `range()` — the gold step
    * (reference: load_data_task.py:177-191) gets a hash-verified check
    * without a network fetch of real archives. */
  private val SyntheticN = 5000L
  private def aN = SyntheticN / 10  // 500 actors
  private def rN = SyntheticN / 20  // 250 repos
  private def oN = SyntheticN / 100 // 50 org ids, 40 surface (id%5==0 dropped)

  private def ghUsersSql =
    s"""WITH s AS (SELECT range AS id FROM range($SyntheticN))
       |SELECT DISTINCT id % $aN AS id,
       |  'user-' || CAST(id % $aN AS VARCHAR) AS login,
       |  '' AS gravatar_id,
       |  'http://a/' || CAST(id % $aN AS VARCHAR) AS avatar_url,
       |  'http://api/users/' || CAST(id % $aN AS VARCHAR) AS url
       |FROM s ORDER BY id""".stripMargin

  private def ghReposSql =
    s"""WITH s AS (SELECT range AS id FROM range($SyntheticN))
       |SELECT DISTINCT id % $rN AS id,
       |  'repo-' || CAST(id % $rN AS VARCHAR) AS name,
       |  'http://api/repos/' || CAST(id % $rN AS VARCHAR) AS url
       |FROM s ORDER BY id""".stripMargin

  private def ghOrgsSql =
    s"""WITH s AS (SELECT range AS id FROM range($SyntheticN) WHERE range % 5 <> 0)
       |SELECT DISTINCT id % $oN AS id,
       |  'org-' || CAST(id % $oN AS VARCHAR) AS login,
       |  '' AS gravatar_id,
       |  'http://a/o' || CAST(id % $oN AS VARCHAR) AS avatar_url,
       |  'http://api/orgs/' || CAST(id % $oN AS VARCHAR) AS url
       |FROM s ORDER BY id""".stripMargin

  private def ghEventsFlatSql =
    s"""WITH s AS (SELECT range AS id FROM range($SyntheticN))
       |SELECT id % $aN AS actor_id,
       |  CASE WHEN id % 5 = 0 THEN NULL ELSE id % $oN END AS org_id,
       |  CAST(id AS VARCHAR) AS id,
       |  TIMESTAMP '2015-01-01 15:00:00' + (id % 3600) * INTERVAL 1 SECOND AS created_at,
       |  CASE id % 4 WHEN 0 THEN 'PushEvent' WHEN 1 THEN 'WatchEvent'
       |              WHEN 2 THEN 'ForkEvent' ELSE 'IssuesEvent' END AS type,
       |  id % 10 <> 0 AS public,
       |  id % $rN AS repo_id,
       |  'repo-' || CAST(id % $rN AS VARCHAR) AS repo_name,
       |  'http://api/repos/' || CAST(id % $rN AS VARCHAR) AS repo_url
       |FROM s ORDER BY id""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("gh_users", t => users(synthetic(t.spark, SyntheticN)).orderBy("id"), Some(ghUsersSql)),
    QueryDef("gh_repos", t => repos(synthetic(t.spark, SyntheticN)).orderBy("id"), Some(ghReposSql)),
    QueryDef("gh_orgs", t => organizations(synthetic(t.spark, SyntheticN)).orderBy("id"), Some(ghOrgsSql)),
    QueryDef("gh_events_flat", t => events(synthetic(t.spark, SyntheticN)).orderBy("id"), Some(ghEventsFlatSql))
  )
}
