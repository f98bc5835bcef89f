package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference pipeline's ELT surface re-expressed over the test schema.
  *
  * The reference's silver step parses raw GH-Archive JSON with an explicit
  * schema, drops the freeform payload, and normalizes timestamps
  * (reference: pipeline/airflow/dags/load_data_task.py:117-145); its gold
  * step extracts dimensions by distinct projection — users/repos/orgs —
  * and flattens the fact (load_data_task.py:177-191). Here the fact is
  * `events` (props is the payload analog), and the dims derive from it.
  *
  * Scale: dim extraction is a groupBy on a bounded key (map-side combine
  * carries most of the weight); enrichment joins the extracted dim back
  * against the fact on the fact's natural key (AQE broadcasts the dim
  * when it fits; it grows with the data, so it is never hint-forced).
  */
object Etl {

  /** Silver-style normalization: typed projection, payload (`props` JSON)
    * parsed to a typed column rather than dropped blind. */
  def eventsClean(t: Tables): DataFrame =
    t.events
      .select(
        col("event_id"),
        col("ts"),
        col("user_id"),
        col("event_type"),
        round(col("value"), 4).as("value"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k")
      )
      .orderBy("event_id")

  private val eventsCleanSql =
    """SELECT event_id, ts, user_id, event_type, round(value,4) AS value,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
      |FROM events ORDER BY event_id""".stripMargin

  /** Gold-style user dimension: distinct users with activity bounds
    * (≅ reference `users_df = delta_df.select("actor.*").distinct()`). */
  def userDim(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"))
      .agg(
        min(col("ts")).as("first_seen"),
        max(col("ts")).as("last_seen"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("total_value")
      )
      .orderBy("user_id")

  private val userDimSql =
    """SELECT user_id, min(ts) AS first_seen, max(ts) AS last_seen,
      |  count(*) AS n_events, round(sum(value),4) AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Distinct event-type dimension (≅ repos/orgs distinct projections). */
  def eventTypeDim(t: Tables): DataFrame =
    t.events
      .select(col("event_type"))
      .distinct()
      .orderBy("event_type")

  private val eventTypeDimSql =
    "SELECT DISTINCT event_type FROM events ORDER BY event_type"

  /** Gold fact enrichment: fact joined back to its extracted user dim —
    * the write_tables_in_gold join shape. The dim side broadcasts. */
  def dimEnrichment(t: Tables): DataFrame = {
    val users = userDim(t).select(
      col("user_id").as("u_user_id"),
      col("first_seen"),
      col("n_events").as("user_n_events"))
    // no broadcast hint: the user dim is extracted from the fact, so its
    // cardinality grows with the data; AQE broadcasts it when it fits
    t.events
      .join(users, col("user_id") === col("u_user_id"))
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        round(col("value"), 4).as("value"),
        col("first_seen").as("user_first_seen"),
        col("user_n_events")
      )
      .orderBy("event_id")
  }

  private val dimEnrichmentSql =
    """SELECT event_id, user_id, event_type, round(value,4) AS value,
      |  u.first_seen AS user_first_seen, u.user_n_events
      |FROM events
      |JOIN (SELECT user_id AS u_user_id, min(ts) AS first_seen, count(*) AS user_n_events
      |      FROM events GROUP BY user_id) u
      |  ON user_id = u_user_id
      |ORDER BY event_id""".stripMargin

  /** Deterministic hash sampling: ~10% of documents selected by 60-bit
    * hash bucket — reproducible across engines, runs, and cluster sizes
    * (the production alternative to seeded RNG sampling, which is neither
    * engine- nor partitioning-stable). */
  def sampleDeterministic(t: Tables): DataFrame =
    t.documents
      .filter(graft.functions.Hashing.md5Long(
        org.apache.spark.sql.functions.concat(lit("sample:"), col("doc_id"))) % 100 < 10)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  private val sampleDeterministicSql =
    s"""SELECT doc_id, source FROM documents
       |WHERE ${graft.functions.Hashing.sqlMd5Long("concat('sample:', doc_id)")} % 100 < 10
       |ORDER BY doc_id""".stripMargin

  /** CDC latest-wins compaction: treat events as a change log and keep
    * each user's most recent record (the MERGE/upsert read-side at scale:
    * one window per key, no global sort). */
  def upsertLatest(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rank on explicit epoch-µs so both engines order identically even
    // for sources with sub-µs timestamp precision
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")).desc, col("event_id").desc)
    t.events
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), col("event_type").as("last_type"))
      .orderBy("user_id")
  }

  private val upsertLatestSql =
    """SELECT user_id, event_id AS last_event_id, ts AS last_ts, event_type AS last_type
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rnk
      |      FROM events)
      |WHERE rnk = 1 ORDER BY user_id""".stripMargin

  /** Context-window budget for sequence packing (tokens per pack). */
  private val PackCtx = 512
  /** Hash-bucket fan-out within each (source, lang) stratum. */
  private val PackBuckets = 4

  /** Sequence packing: assign each document a (stratum, pack) slot in the
    * concat-then-chunk scheme — docs are laid end-to-end in deterministic
    * doc_id order and cut every [[PackCtx]] tokens; a doc belongs to the
    * pack where it STARTS. The training-data step that turns a curated
    * corpus into fixed-length context windows.
    *
    * Scale: the running sum is windowed per (source, lang, bucket), where
    * bucket is a deterministic doc_id hash — so a billion-doc stratum
    * fans out over [[PackBuckets]]× more partitions instead of funneling
    * one partition per (source, lang). Packing is equally valid within
    * any sub-partition; raise [[PackBuckets]] with corpus size. */
  def packSequences(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"), col("lang"), col("bucket"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.documents
      .withColumn("bucket", col("doc_id") % PackBuckets)
      .withColumn("n_tokens", size(graft.functions.TextOps.tokens(col("text"))).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("source"), col("lang"), col("bucket"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(PackCtx.toDouble)).as("pack_id"),
        (col("cum") - col("n_tokens")
          - floor((col("cum") - col("n_tokens")) / lit(PackCtx.toDouble)) * PackCtx)
          .as("pack_offset"))
      .orderBy("doc_id")
  }

  private val packSequencesSql =
    s"""SELECT doc_id, source, lang, bucket, n_tokens,
       |  CAST(floor((cum - n_tokens) / ${PackCtx}.0) AS BIGINT) AS pack_id,
       |  CAST(cum - n_tokens - floor((cum - n_tokens) / ${PackCtx}.0) * $PackCtx AS BIGINT) AS pack_offset
       |FROM (SELECT doc_id, source, lang, bucket, n_tokens,
       |        sum(n_tokens) OVER (PARTITION BY source, lang, bucket ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM (SELECT doc_id, source, lang, doc_id % $PackBuckets AS bucket,
       |              len(${graft.functions.TextOps.sqlTokens("text")}) AS n_tokens
       |            FROM documents))
       |ORDER BY doc_id""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("etl_pack_sequences", packSequences, Some(packSequencesSql)),
    QueryDef("etl_sample_deterministic", sampleDeterministic, Some(sampleDeterministicSql)),
    QueryDef("etl_upsert_latest", upsertLatest, Some(upsertLatestSql)),
    QueryDef("etl_events_clean", eventsClean, Some(eventsCleanSql)),
    QueryDef("etl_user_dim", userDim, Some(userDimSql)),
    QueryDef("etl_event_type_dim", eventTypeDim, Some(eventTypeDimSql)),
    QueryDef("etl_dim_enrichment", dimEnrichment, Some(dimEnrichmentSql))
  )
}
