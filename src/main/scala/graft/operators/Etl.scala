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

  /** Exact per-stratum quota for the stratified sample. */
  private val StratQuota = 100

  /** Stratified sampling with EXACT quotas: the first [[StratQuota]] docs
    * per source under a deterministic hash order — the data-mixing
    * primitive ("N documents from each domain") that percentage sampling
    * ([[sampleDeterministic]]) can't express. Hash ranking keeps the draw
    * reproducible across engines, runs, and repartitioning; the rank runs
    * through the native [[graft.plans.TopKPerKey]] bounded-heap operator,
    * so each task holds strata × quota rows and nothing sorts the corpus
    * (the window-rank oracle formulation is what proves it right). */
  def sampleStratified(t: Tables): DataFrame = {
    val ranked = t.documents.select(col("source"), col("doc_id"),
      graft.functions.Hashing.md5Long(concat(lit("strat:"), col("doc_id"))).as("h"))
    graft.plans.TopKPerKey(ranked, Seq("source"), Seq(("h", true), ("doc_id", true)), StratQuota)
      .select(col("source"), col("doc_id"))
      .orderBy("source", "doc_id")
  }

  private val sampleStratifiedSql =
    s"""SELECT source, doc_id FROM (
       |  SELECT source, doc_id, row_number() OVER (
       |    PARTITION BY source
       |    ORDER BY ${graft.functions.Hashing.sqlMd5Long("concat('strat:', doc_id)")} ASC, doc_id ASC) AS rn
       |  FROM documents)
       |WHERE rn <= $StratQuota ORDER BY source, doc_id""".stripMargin

  /** Domain-mixing weights: per-source sampling weight that would move the
    * corpus from its ACTUAL token share to a uniform TARGET share — the
    * number a training-data loader multiplies each domain's sampling rate
    * by. Token mass uses the est-BPE convention (`ceil(n_chars/4)`,
    * matching `text_token_counts`). One aggregate keyed on source plus a
    * single-row broadcast of the totals: no corpus-wide second pass at
    * any scale. */
  def mixWeights(t: Tables): DataFrame = {
    val agg = t.documents.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(ceil(col("n_chars") / lit(4.0)).cast("long")).as("est_tokens"))
    val tot = agg.agg(sum(col("est_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    val actualShare = col("est_tokens") / col("tot_tokens").cast("double")
    val targetShare = lit(1.0) / col("n_sources")
    agg.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("est_tokens"),
        round(actualShare, 4).as("actual_share"),
        round(targetShare, 4).as("target_share"),
        round(targetShare / actualShare, 4).as("mix_weight"))
      .orderBy("source")
  }

  private val mixWeightsSql =
    """WITH agg AS (
      |  SELECT source, count(*) AS n_docs,
      |    sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS est_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT sum(est_tokens) AS tot_tokens, count(*) AS n_sources FROM agg)
      |-- CAST back to BIGINT: DuckDB widens sum(BIGINT) to HUGEINT (int128),
      |-- which the driver's fetch path stringifies differently than int64
      |SELECT source, n_docs, CAST(est_tokens AS BIGINT) AS est_tokens,
      |  round(est_tokens / CAST(tot_tokens AS DOUBLE), 4) AS actual_share,
      |  round(1.0 / n_sources, 4) AS target_share,
      |  round((1.0 / n_sources) / (est_tokens / CAST(tot_tokens AS DOUBLE)), 4) AS mix_weight
      |FROM agg, tot ORDER BY source""".stripMargin

  /** TOKEN-EXACT mixing weights: [[mixWeights]] with the est-BPE
    * heuristic replaced by real BPE counts
    * ([[graft.functions.Bpe.tokenCount]], a codegen'd per-row
    * expression) — the token mass a training loader actually consumes,
    * so the weights are exact rather than ±25% of exact. Plan shape is
    * IDENTICAL to the estimate variant (one source-keyed aggregate +
    * 1-row broadcast); the tokenizer adds per-row CPU, no shuffle. */
  def mixWeightsBpe(t: Tables): DataFrame = {
    val agg = t.documents.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(graft.functions.Bpe.tokenCount(col("text")).cast("long")).as("bpe_tokens"))
    val tot = agg.agg(sum(col("bpe_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    val actualShare = col("bpe_tokens") / col("tot_tokens").cast("double")
    val targetShare = lit(1.0) / col("n_sources")
    agg.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("bpe_tokens"),
        round(actualShare, 4).as("actual_share"),
        round(targetShare, 4).as("target_share"),
        round(targetShare / actualShare, 4).as("mix_weight"))
      .orderBy("source")
  }

  private val mixWeightsBpeSql =
    s"""WITH agg AS (
       |  SELECT source, count(*) AS n_docs,
       |    sum(${graft.functions.Bpe.sqlTokenCount("text")}) AS bpe_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(bpe_tokens) AS tot_tokens, count(*) AS n_sources FROM agg)
       |SELECT source, n_docs, CAST(bpe_tokens AS BIGINT) AS bpe_tokens,
       |  round(bpe_tokens / CAST(tot_tokens AS DOUBLE), 4) AS actual_share,
       |  round(1.0 / n_sources, 4) AS target_share,
       |  round((1.0 / n_sources) / (bpe_tokens / CAST(tot_tokens AS DOUBLE)), 4) AS mix_weight
       |FROM agg, tot ORDER BY source""".stripMargin

  /** Temperature for [[mixTemperature]]: T > 1 flattens the source
    * distribution toward uniform (T → ∞ is uniform, T = 1 is natural). */
  private val MixTemperature = 2.0

  /** Temperature-scaled mixing weights — the multilingual/multi-corpus
    * sampling scheme (share^(1/T), renormalized): up-samples small
    * sources without fully flattening the mix, the standard between
    * "natural" and "uniform" that [[mixWeights]] targets. Same plan
    * shape as mixWeights: one aggregate + two 1-row broadcast
    * bounds-joins, no corpus-wide shuffle at any scale. */
  def mixTemperature(t: Tables): DataFrame = {
    val agg = t.documents.groupBy(col("source")).agg(
      sum(ceil(col("n_chars") / lit(4.0)).cast("long")).as("est_tokens"))
    val tot = agg.agg(sum(col("est_tokens")).as("tot_tokens"))
    val share = col("est_tokens") / col("tot_tokens").cast("double")
    val scaled = pow(share, lit(1.0 / MixTemperature))
    val shares = agg.crossJoin(broadcast(tot))
      .select(col("source"), col("est_tokens"), share.as("share"), scaled.as("scaled"))
    val z = shares.agg(sum(col("scaled")).as("z"))
    shares.crossJoin(broadcast(z))
      .select(col("source"), col("est_tokens"),
        round(col("share"), 4).as("natural_share"),
        round(col("scaled") / col("z"), 4).as("temp_share"),
        round((col("scaled") / col("z")) / col("share"), 4).as("mix_weight"))
      .orderBy("source")
  }

  private val mixTemperatureSql =
    s"""WITH agg AS (
       |  SELECT source, sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS est_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(est_tokens) AS tot_tokens FROM agg),
       |shares AS (
       |  SELECT source, CAST(est_tokens AS BIGINT) AS est_tokens,
       |    est_tokens / CAST(tot_tokens AS DOUBLE) AS share,
       |    power(est_tokens / CAST(tot_tokens AS DOUBLE), ${1.0 / MixTemperature}) AS scaled
       |  FROM agg, tot),
       |z AS (SELECT sum(scaled) AS z FROM shares)
       |SELECT source, est_tokens, round(share, 4) AS natural_share,
       |  round(scaled / z, 4) AS temp_share,
       |  round((scaled / z) / share, 4) AS mix_weight
       |FROM shares, z ORDER BY source""".stripMargin

  /** UniMax budget (×corpus tokens) and per-source epoch cap: 2 epochs
    * is the paper's repetition ceiling before quality degrades, and a
    * 1.9× budget is the upsampling regime it targets — small sources
    * saturate at the cap while the rest share the remainder, so BOTH
    * branches of the allocation run against the near-uniform synthetic
    * sources. */
  private val UnimaxBudgetShare = 1.9
  private val UnimaxMaxEpochs = 2.0

  /** UniMax allocation (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling"): spread a total token budget as
    * UNIFORMLY across sources as each source's epoch cap allows —
    * small sources saturate at `MaxEpochs` passes over their data and
    * their leftover re-spreads over the rest. Closed form over caps
    * sorted ascending: source i is capped iff its cap times the number
    * of sources not yet allocated fits the budget left after capping
    * everything smaller; every uncapped source then gets the SAME fair
    * share `(budget − Σ capped caps) / #uncapped`. The water-filling
    * loop becomes two window passes over the k-row source aggregate —
    * the single-partition window is k rows by construction, so the one
    * corpus-scale operation remains the groupBy. */
  def mixUnimax(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = t.documents.groupBy(col("source")).agg(
      sum(ceil(col("n_chars") / lit(4.0)).cast("long")).as("est_tokens"))
    val tot = agg.agg(sum(col("est_tokens")).as("tot_tokens"), count(lit(1)).as("k"))
    val w = Window.orderBy(col("cap"), col("source"))
    val based = agg.crossJoin(broadcast(tot))
      .withColumn("cap", col("est_tokens") * lit(UnimaxMaxEpochs))
      .withColumn("budget", col("tot_tokens") * lit(UnimaxBudgetShare))
      .withColumn("rn", row_number().over(w))
      .withColumn("prefix", coalesce(
        sum(col("cap")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .withColumn("capped",
        col("cap") * (col("k") - col("rn") + 1) <= col("budget") - col("prefix"))
    val closed = based.agg(
      sum(when(col("capped"), col("cap")).otherwise(lit(0.0))).as("capped_sum"),
      sum(when(col("capped"), lit(0L)).otherwise(lit(1L))).as("n_uncapped"))
    val alloc = when(col("capped"), col("cap"))
      .otherwise((col("budget") - col("capped_sum")) / col("n_uncapped"))
    based.crossJoin(broadcast(closed))
      .select(col("source"), col("est_tokens"),
        round(alloc, 4).as("alloc_tokens"),
        round(alloc / col("est_tokens"), 4).as("epochs"))
      .orderBy("source")
  }

  private val mixUnimaxSql =
    s"""WITH agg AS (
       |  SELECT source, sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS est_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(est_tokens) AS DOUBLE) AS tot_tokens, count(*) AS k FROM agg),
       |b AS (
       |  SELECT source, est_tokens, $UnimaxMaxEpochs * est_tokens AS cap,
       |    $UnimaxBudgetShare * tot_tokens AS budget, k,
       |    row_number() OVER (ORDER BY $UnimaxMaxEpochs * est_tokens, source) AS rn,
       |    coalesce(sum($UnimaxMaxEpochs * est_tokens) OVER (
       |      ORDER BY $UnimaxMaxEpochs * est_tokens, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
       |  FROM agg, tot),
       |c AS (SELECT *, cap * (k - rn + 1) <= budget - prefix AS capped FROM b),
       |s AS (SELECT sum(CASE WHEN capped THEN cap ELSE 0 END) AS capped_sum,
       |        sum(CASE WHEN capped THEN 0 ELSE 1 END) AS n_uncapped FROM c)
       |SELECT source, CAST(est_tokens AS BIGINT) AS est_tokens,
       |  round(CASE WHEN capped THEN cap
       |        ELSE (budget - capped_sum) / n_uncapped END, 4) AS alloc_tokens,
       |  round((CASE WHEN capped THEN cap
       |         ELSE (budget - capped_sum) / n_uncapped END) / est_tokens, 4) AS epochs
       |FROM c, s ORDER BY source""".stripMargin

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

  /** Hash-bucket fan-out within each (source, lang) pack stratum —
    * runtime config `spark.graft.etl.packBuckets` (default 4, the
    * value the oracle pins). The bucket is a doc_id HASH, not a
    * modulus: corpora that assign source/lang BY a doc_id modulus (the
    * fixture does) would make a modulo bucket constant within every
    * stratum, silently disabling the fan-out. Raise the conf with
    * corpus size so no running-sum partition outgrows an executor. */
  private[graft] val PackBucketsConf = "spark.graft.etl.packBuckets"
  private val PackBucketsDefault = 4
  private def packBuckets(spark: org.apache.spark.sql.SparkSession): Int = {
    val n = spark.conf.get(PackBucketsConf, PackBucketsDefault.toString).toInt
    require(n >= 1, s"$PackBucketsConf must be >= 1, got $n")
    n
  }
  private def packBucketCol(t: Tables) =
    graft.functions.Hashing.bucketCol(col("doc_id"), "pk", packBuckets(t.spark))

  /** Board-facing guard: the DuckDB oracle SQL hardcodes
    * [[PackBucketsDefault]], so a session tuned to another bucket count
    * would make operator and oracle disagree BY CONSTRUCTION rather
    * than flag a real defect — fail loud instead of reporting a fake
    * board mismatch. Production callers use [[packSequences]] /
    * [[packSequencesBpe]] directly and tune freely. */
  private def requireOraclePackBuckets(spark: org.apache.spark.sql.SparkSession): Unit = {
    val n = packBuckets(spark)
    require(n == PackBucketsDefault,
      s"$PackBucketsConf=$n, but the correctness oracle pins $PackBucketsDefault — " +
        "run the board under the default, or regenerate the oracle for the tuned value")
  }
  private[graft] def packSequencesBoard(t: Tables): DataFrame = {
    requireOraclePackBuckets(t.spark); packSequences(t)
  }
  private[graft] def packSequencesBpeBoard(t: Tables): DataFrame = {
    requireOraclePackBuckets(t.spark); packSequencesBpe(t)
  }

  /** Sequence packing: assign each document a (stratum, pack) slot in the
    * concat-then-chunk scheme — docs are laid end-to-end in deterministic
    * doc_id order and cut every [[PackCtx]] tokens; a doc belongs to the
    * pack where it STARTS. The training-data step that turns a curated
    * corpus into fixed-length context windows.
    *
    * Scale: the running sum is windowed per (source, lang, bucket), where
    * bucket is a deterministic doc_id hash — so a billion-doc stratum
    * fans out over `packBuckets`× more partitions instead of funneling
    * one partition per (source, lang). Packing is equally valid within
    * any sub-partition; raise `spark.graft.etl.packBuckets` with corpus size. */
  def packSequences(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"), col("lang"), col("bucket"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.documents
      .withColumn("bucket", packBucketCol(t))
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

  /** TOKEN-EXACT sequence packing: [[packSequences]] with whitespace
    * token counts replaced by real BPE counts — pack offsets then
    * address the loader's actual context-window positions. Same plan:
    * one window per (source, lang, bucket), tokenization per-row. */
  def packSequencesBpe(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"), col("lang"), col("bucket"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.documents
      .withColumn("bucket", packBucketCol(t))
      .withColumn("n_tokens", graft.functions.Bpe.tokenCount(col("text")).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("source"), col("lang"), col("bucket"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(PackCtx.toDouble)).as("pack_id"),
        (col("cum") - col("n_tokens")
          - floor((col("cum") - col("n_tokens")) / lit(PackCtx.toDouble)) * PackCtx)
          .as("pack_offset"))
      .orderBy("doc_id")
  }

  private val packSequencesBpeSql =
    s"""SELECT doc_id, source, lang, bucket, n_tokens,
       |  CAST(floor((cum - n_tokens) / ${PackCtx}.0) AS BIGINT) AS pack_id,
       |  CAST(cum - n_tokens - floor((cum - n_tokens) / ${PackCtx}.0) * $PackCtx AS BIGINT) AS pack_offset
       |FROM (SELECT doc_id, source, lang, bucket, n_tokens,
       |        sum(n_tokens) OVER (PARTITION BY source, lang, bucket ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM (SELECT doc_id, source, lang,
       |              ${graft.functions.Hashing.sqlBucket("doc_id", "pk", PackBucketsDefault)} AS bucket,
       |              ${graft.functions.Bpe.sqlTokenCount("text")} AS n_tokens
       |            FROM documents))
       |ORDER BY doc_id""".stripMargin

  private val packSequencesSql =
    s"""SELECT doc_id, source, lang, bucket, n_tokens,
       |  CAST(floor((cum - n_tokens) / ${PackCtx}.0) AS BIGINT) AS pack_id,
       |  CAST(cum - n_tokens - floor((cum - n_tokens) / ${PackCtx}.0) * $PackCtx AS BIGINT) AS pack_offset
       |FROM (SELECT doc_id, source, lang, bucket, n_tokens,
       |        sum(n_tokens) OVER (PARTITION BY source, lang, bucket ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM (SELECT doc_id, source, lang,
       |              ${graft.functions.Hashing.sqlBucket("doc_id", "pk", PackBucketsDefault)} AS bucket,
       |              len(${graft.functions.TextOps.sqlTokens("text")}) AS n_tokens
       |            FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** SCD Type-2 history build: each user's `event_type` state changes as
    * validity intervals — the warehouse dimension-history pattern (Kimball
    * SCD2), derived scalably from the raw event stream.
    *
    * Two per-user windows, nothing else: a `lag` marks change points, a
    * `lead` OVER THE CHANGE POINTS closes each interval. No MERGE loop, no
    * driver iteration — at 100 TB this is two window passes over a hash
    * partition by user (and the first `lag` could fold into any upstream
    * per-user sort). Epoch-ms columns, not raw timestamps, so the interval
    * arithmetic is engine-portable. */
  def scd2UserState(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to_ms", lead(unix_millis(col("ts")), 1).over(w))
      .select(
        col("user_id"), col("event_type").as("state"),
        unix_millis(col("ts")).as("valid_from_ms"), col("valid_to_ms"),
        when(col("valid_to_ms").isNull, 1).otherwise(0).as("is_current"))
      // Deterministic presentation order: (user_id, valid_from_ms) alone
      // ties when one user changes state twice in the same millisecond, and
      // Spark vs DuckDB may emit tied rows differently. Sorting by every
      // output column breaks ties up to fully-identical rows (where order
      // is immaterial); is_current precedes valid_to_ms so the comparator
      // never ranks NULL against non-null (Spark = NULLS FIRST, DuckDB =
      // NULLS LAST — is_current splits the null/non-null rows first).
      .orderBy("user_id", "valid_from_ms", "state", "is_current", "valid_to_ms")
  }

  private val scd2UserStateSql =
    """SELECT user_id, event_type AS state, epoch_ms(ts) AS valid_from_ms,
      |  lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_ms,
      |  CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |       THEN 1 ELSE 0 END AS is_current
      |FROM (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |      FROM events)
      |WHERE prev_type IS NULL OR prev_type <> event_type
      |ORDER BY user_id, valid_from_ms, state, is_current, valid_to_ms""".stripMargin

  /** Bits per key interleaved into the Z-value (42-bit result). */
  private[graft] val ZBits = 21

  /** Morton/Z-order interleave of two long keys (Morton 1966; the Delta
    * OPTIMIZE ZORDER layout primitive): bit i of each key lands at bits
    * 2i/2i+1, so sorting by the Z-value clusters rows that are close in
    * BOTH dimensions. Written as a pure column expression — 42 shift/mask
    * adds, all inside whole-stage codegen. Keys must fit [[ZBits]] bits
    * (mask-truncated here; map domains down first for wider keys). */
  private[graft] def zInterleave(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .plus(shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i))
        .plus(shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  private def sqlZInterleave(a: String, b: String): String =
    (0 until ZBits).flatMap(i => Seq(
      s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})"
    )).mkString(" + ")

  /** Interleaving raw keys wastes the curve when domains differ in width
    * (one key's high bits dominate every split), so each key is first
    * scaled to the full [[ZBits]]-bit space by its min/max — the same idea
    * as Delta OPTIMIZE ZORDER's per-column range-partition ids (which are
    * the skew-robust upgrade: sampled rank buckets instead of linear
    * scaling). Bounds come from a 1-row aggregate crossJoined in (always
    * exactly one row — broadcast is safe at any SF). */
  private[graft] def withScaledZ(df: DataFrame, keyA: String, keyB: String,
      as: String): DataFrame = {
    val maxv = lit(((1L << ZBits) - 1).toDouble)
    // collision-proof internal names: the caller's frame may carry any
    // user columns, and crossJoin + drop must never touch them
    val bounds = df.agg(
      min(col(keyA)).as("__z_amin"), max(col(keyA)).as("__z_amax"),
      min(col(keyB)).as("__z_bmin"), max(col(keyB)).as("__z_bmax"))
    def scale(c: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
        hi: org.apache.spark.sql.Column) =
      floor((c - lo).cast("double") * maxv / greatest(hi - lo, lit(1)).cast("double"))
    df.crossJoin(broadcast(bounds))
      .withColumn(as,
        zInterleave(scale(col(keyA), col("__z_amin"), col("__z_amax")),
          scale(col(keyB), col("__z_bmin"), col("__z_bmax"))))
      .drop("__z_amin", "__z_amax", "__z_bmin", "__z_bmax")
  }

  /** Z-value assignment for the (l_partkey, l_suppkey) fact layout — the
    * computation behind [[zorderWrite]], exposed as an oracle-checked
    * query. Sorting the fact by `zval` before writing gives every file a
    * tight bounding box in BOTH keys, so parquet min/max pruning skips
    * files for predicates on EITHER — the data-skipping layout a 100-TB
    * scan depends on (verified against a shuffled layout in `ZorderSpec`). */
  def zorderKey(t: Tables): DataFrame =
    withScaledZ(t.lineitem, "l_partkey", "l_suppkey", "zval")
      .select(col("l_orderkey"), col("l_linenumber"), col("zval"))
      .orderBy("zval", "l_orderkey", "l_linenumber")

  private val zorderKeySql = {
    val m = (1L << ZBits) - 1
    s"""SELECT l_orderkey, l_linenumber, ${sqlZInterleave("sp", "ss")} AS zval
       |FROM (SELECT l_orderkey, l_linenumber,
       |        CAST(floor((l_partkey - amin) * $m.0 / greatest(amax - amin, 1)) AS BIGINT) AS sp,
       |        CAST(floor((l_suppkey - bmin) * $m.0 / greatest(bmax - bmin, 1)) AS BIGINT) AS ss
       |      FROM lineitem CROSS JOIN
       |        (SELECT min(l_partkey) AS amin, max(l_partkey) AS amax,
       |                min(l_suppkey) AS bmin, max(l_suppkey) AS bmax FROM lineitem))
       |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin
  }

  /** Write `df` clustered by the Z-value of two long key columns:
    * range-partition on `zval` (sampled balanced ranges — each output file
    * is a contiguous Z-curve segment), sort within partitions, drop the
    * helper column at the writer. */
  def zorderWrite(df: DataFrame, keyA: String, keyB: String, path: String,
      nFiles: Int): Unit =
    writeByZ(withScaledZ(df, keyA, keyB, "__zval"), path, nFiles)

  /** Bits per key for the rank-bucketed Z-value: 2^10 equi-depth buckets
    * per key — enough resolution for thousands of output files, few enough
    * that the sampled boundary arrays stay ~8 KB plan literals. */
  private[graft] val RankZBits = 10

  /** [[withScaledZ]]'s skew-robust upgrade (what Delta OPTIMIZE ZORDER
    * actually does): each key is mapped to its EQUI-DEPTH quantile bucket
    * before interleaving, so a key with exponential skew still spreads
    * uniformly over the curve — linear min/max scaling would crowd most
    * rows into a few Z-cells and per-file min/max pruning on that key
    * would degenerate.
    *
    * ONE extra pass computes 2^[[RankZBits]]−1 sampled boundaries for
    * BOTH keys (a single 1-row `percentile_approx` aggregate — the only
    * driver-side value is the two ~8 KB boundary arrays), then each row
    * finds its bucket via the native O(log B) [[graft.plans.ArrayBisect]]
    * expression inside whole-stage codegen. */
  private[graft] def withRankedZ(df: DataFrame, keyA: String, keyB: String,
      as: String): DataFrame = {
    val b = 1 << RankZBits
    val pcts = array((1 until b).map(i => lit(i.toDouble / b)): _*)
    val row = df.agg(
      percentile_approx(col(keyA).cast("double"), pcts, lit(10000)).as("ba"),
      percentile_approx(col(keyB).cast("double"), pcts, lit(10000)).as("bb")).head()
    def boundsAt(i: Int): Seq[Double] =
      if (row.isNullAt(i)) Seq.empty else row.getSeq[Double](i) // null = empty input
    df.withColumn(as, zInterleave(
      graft.plans.ArrayBisect(boundsAt(0), col(keyA).cast("double")).cast("long"),
      graft.plans.ArrayBisect(boundsAt(1), col(keyB).cast("double")).cast("long")))
  }

  /** Shared layout-write tail: range-partition on the z-value (contiguous
    * curve segment per file), sort within, drop the helper, overwrite. */
  private def writeByZ(zdf: DataFrame, path: String, nFiles: Int): Unit =
    zdf.repartitionByRange(nFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write.mode("overwrite").parquet(path)

  /** [[zorderWrite]] with equi-depth rank bucketing ([[withRankedZ]]) —
    * the layout to use when either key is skewed. */
  def zorderWriteRanked(df: DataFrame, keyA: String, keyB: String, path: String,
      nFiles: Int): Unit =
    writeByZ(withRankedZ(df, keyA, keyB, "__zval"), path, nFiles)

  // ---- DSIR importance resampling (Xie et al. 2023, NeurIPS:
  // "Data Selection for Language Models via Importance Resampling") ----

  /** Feature-hash buckets for the DSIR n-gram model. The paper uses 10k;
    * 64 keeps the oracle SQL tractable at test scale — the plan shape is
    * bucket-count-independent (the ratio table stays a broadcast at 10k
    * too). */
  private val DsirBuckets = 64

  /** (doc_id, bucket) token occurrences: each token hashes into one of
    * [[DsirBuckets]] buckets via the engine-portable md5 hash. */
  private def dsirTokenBuckets(t: Tables): DataFrame =
    t.documents.select(col("doc_id"), col("lang"),
        explode(graft.functions.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("b",
        graft.functions.Hashing.md5Long(concat(lit("dsir:"), col("tok"))) % DsirBuckets)

  /** DSIR importance log-weights: how much each document resembles the
    * TARGET domain (here `lang = 'en'`) relative to the raw corpus,
    * under hashed-unigram bag-of-words models — `w_d = Σ_tokens
    * log(p̂[b(tok)] / q̂[b(tok)])` with add-one smoothing, p̂ fit on the
    * target slice and q̂ on everything. The weights feed
    * [[dsirSample]]'s Gumbel top-k; they are the oracle-checked surface
    * (row-per-doc, deterministic to 4dp across engines).
    *
    * Scale: two passes over the token stream — model fit (a
    * [[DsirBuckets]]-row aggregate, map-side combine, tiny result) and
    * scoring (the log-ratio table BROADCASTS into a doc-keyed sum) —
    * exactly the paper's fit-then-score shape. Nothing quadratic, no
    * corpus-wide shuffle beyond the per-doc aggregation the answer
    * inherently needs. */
  def dsirWeights(t: Tables): DataFrame = {
    val toks = dsirTokenBuckets(t)
    val pq = toks.groupBy(col("b")).agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("np"),
      count(lit(1)).as("nq"))
    val tot = pq.agg(sum(col("np")).as("tp"), sum(col("nq")).as("tq"))
    val ratios = pq.crossJoin(broadcast(tot)).select(col("b"),
      (log((col("np") + 1.0) / (col("tp") + lit(DsirBuckets).cast("double"))) -
        log((col("nq") + 1.0) / (col("tq") + lit(DsirBuckets).cast("double")))).as("lr"))
    toks.join(broadcast(ratios), "b")
      .groupBy(col("doc_id"))
      .agg(round(sum(col("lr")), 4).as("dsir_logweight"))
      .orderBy("doc_id")
  }

  private def dsirWeightsCte: String = {
    val h = graft.functions.Hashing.sqlMd5Long("concat('dsir:', tok)")
    s"""WITH toks0 AS (
       |  SELECT doc_id, lang,
       |    unnest(${graft.functions.TextOps.sqlTokens("text")}) AS tok
       |  FROM documents),
       |tk AS (
       |  SELECT doc_id, lang, $h % $DsirBuckets AS b
       |  FROM toks0 WHERE tok <> ''),
       |pq AS (
       |  SELECT b, sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np, count(*) AS nq
       |  FROM tk GROUP BY b),
       |tot AS (SELECT sum(np) AS tp, sum(nq) AS tq FROM pq),
       |r AS (
       |  SELECT b, ln((np + 1.0) / (tp + $DsirBuckets.0)) -
       |            ln((nq + 1.0) / (tq + $DsirBuckets.0)) AS lr
       |  FROM pq, tot),
       |w AS (
       |  SELECT tk.doc_id, sum(r.lr) AS w
       |  FROM tk JOIN r USING (b) GROUP BY tk.doc_id)""".stripMargin
  }

  private def dsirWeightsSql =
    s"""$dsirWeightsCte
       |SELECT doc_id, round(w, 4) AS dsir_logweight FROM w ORDER BY doc_id""".stripMargin

  /** Documents to keep in [[dsirSample]]. */
  private val DsirSampleK = 50

  /** DSIR selection: Gumbel top-k over the importance weights — the
    * paper's sampling-without-replacement step, fully deterministic here
    * (the Gumbel noise derives from the md5 hash of the doc id, so both
    * engines and every re-run draw the same sample). `keep = w_d + G_d`,
    * `G_d = -log(-log(u_d))`; the top [[DsirSampleK]] keys win. One
    * TopK, no shuffle beyond the weight computation itself. */
  def dsirSample(t: Tables): DataFrame = {
    val u = (graft.functions.Hashing.md5Long(concat(lit("dsirg:"), col("doc_id")))
      % 1000000L + 0.5) / 1000000.0
    val gumbel = -log(-log(u))
    dsirWeights(t)
      .withColumn("score", col("dsir_logweight") + gumbel)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(DsirSampleK)
      .select(col("doc_id"), round(col("score"), 4).as("dsir_score"))
      .orderBy("doc_id")
  }

  private def dsirSampleSql = {
    val hg = graft.functions.Hashing.sqlMd5Long("concat('dsirg:', doc_id)")
    s"""$dsirWeightsCte,
       |scored AS (
       |  SELECT doc_id,
       |    round(w, 4) + (- ln(- ln((($hg % 1000000) + 0.5) / 1000000.0))) AS score
       |  FROM w)
       |SELECT doc_id, round(score, 4) AS dsir_score FROM scored
       |ORDER BY score DESC, doc_id LIMIT $DsirSampleK""".stripMargin
  }

  val queries: Seq[QueryDef] = Seq(
    QueryDef("etl_dsir_weights", dsirWeights, Some(dsirWeightsSql)),
    QueryDef("etl_dsir_sample", dsirSample, Some(dsirSampleSql)),
    QueryDef("etl_scd2_user_state", scd2UserState, Some(scd2UserStateSql)),
    QueryDef("etl_zorder_key", zorderKey, Some(zorderKeySql)),
    QueryDef("etl_pack_sequences", packSequencesBoard, Some(packSequencesSql)),
    QueryDef("etl_pack_sequences_bpe", packSequencesBpeBoard, Some(packSequencesBpeSql)),
    QueryDef("etl_sample_deterministic", sampleDeterministic, Some(sampleDeterministicSql)),
    QueryDef("etl_sample_stratified", sampleStratified, Some(sampleStratifiedSql)),
    QueryDef("etl_mix_weights", mixWeights, Some(mixWeightsSql)),
    QueryDef("etl_mix_weights_bpe", mixWeightsBpe, Some(mixWeightsBpeSql)),
    QueryDef("etl_mix_temperature", mixTemperature, Some(mixTemperatureSql)),
    QueryDef("etl_mix_unimax", mixUnimax, Some(mixUnimaxSql)),
    QueryDef("etl_upsert_latest", upsertLatest, Some(upsertLatestSql)),
    QueryDef("etl_events_clean", eventsClean, Some(eventsCleanSql)),
    QueryDef("etl_user_dim", userDim, Some(userDimSql)),
    QueryDef("etl_event_type_dim", eventTypeDim, Some(eventTypeDimSql)),
    QueryDef("etl_dim_enrichment", dimEnrichment, Some(dimEnrichmentSql))
  )
}
