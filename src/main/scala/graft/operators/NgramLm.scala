package graft.operators

import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** PRUNED + BACKOFF n-gram LM with persisted artifacts — the shape
  * CCNet actually ships (a count-pruned KenLM, not an exhaustive
  * in-corpus model). This closes the one 100-TB frontier the r15
  * verdict named: `text_lm_trigram`'s model relation keeps EVERY
  * observed n-gram and so grows with the corpus; here the model
  *
  *   - trains on the CLEAN REFERENCE stratum (`lang = 'en'`, the
  *     `text_lm_ref` precedent — CCNet trains on Wikipedia, reference
  *     size ≪ corpus size), and
  *   - PRUNES bigrams below a count threshold ([[PruneK]]), the
  *     standard KenLM `--prune` discipline, so the persisted relation
  *     is bounded by construction: vocab-sized unigrams + contexts,
  *     and only the bigrams frequent enough to earn their keep.
  *
  * Scoring is STUPID BACKOFF (Brants et al. 2007, "Large Language
  * Models in Machine Translation"): a kept bigram scores its raw
  * relative frequency log(c_pw / c_p); a pruned-or-unseen event backs
  * off to [[BackoffAlpha]] · P_uni(w) with the Laplace-smoothed
  * unigram of `text_lm_ref` (P_uni = (c+1)/(N+V+1), one OOV class) —
  * not a normalized distribution, which is exactly the published
  * trade: at corpus scale the score separates fluent from junk text
  * just as well and needs no discount estimation.
  *
  * The model persists as parquet ARTIFACTS (the `Bpe.saveMerges` /
  * `AnnTraining.saveCentroids` convention, here DISTRIBUTED relations
  * rather than driver-side tables — a pruned LM is bounded but not
  * driver-sized by contract): [[save]] writes `unigrams/ bigrams/
  * contexts/ consts/`, [[load]] re-reads them and re-derives every
  * invariant LOUD — the consts row must reproduce from the unigram
  * relation, every kept bigram must clear the prune threshold, and
  * every kept bigram's context must exist with c_p ≥ c_pw — so a
  * tampered artifact refuses instead of scoring differently from its
  * trainer.
  *
  * Scale: training is two hash aggregates over the REFERENCE stratum;
  * scoring derives n-grams ROW-LOCALLY from each doc's token array
  * (no window shuffle) and joins the model posting-list style on its
  * keys — the `text_lm_score`/`text_lm_ref` plan discipline. The
  * model side of every scoring join is reference-sized and pruned;
  * nothing in the plan grows with the corpus except the corpus's own
  * events. */
object NgramLm {

  /** KenLM-style count prune threshold: bigrams observed fewer than
    * this many times in the reference are dropped from the model. */
  val PruneK = 2

  /** Stupid-backoff weight for pruned/unseen events (Brants et al.
    * 2007 use 0.4 and report insensitivity to the exact value). */
  val BackoffAlpha = 0.4

  /** A trained (or loaded) pruned LM: three keyed relations plus the
    * driver-side consts (bounded: two longs and the two params).
    * `cached` holds the relations a materialized train pinned
    * ([[train]] with `materialize = true`); the lifecycle that asked
    * for them owns [[unpersist]] — a leaked cache entry would let
    * CacheManager substitute it into a LATER query's identical plan,
    * which the bench must never see. */
  final case class PrunedLm(unigrams: DataFrame, bigrams: DataFrame,
      contexts: DataFrame, nRef: Long, vRef: Long, k: Int, alpha: Double,
      cached: Seq[DataFrame] = Nil) {
    def unpersist(): Unit = cached.foreach(_.unpersist(false))
  }

  /** Run independent model-sized actions (artifact writes, validation
    * aggregates) CONCURRENTLY from driver threads (guide §2.6): the
    * artifact lifecycle is a chain of small jobs whose cost is serial
    * driver latency, not executor compute — overlapping them lets the
    * scheduler back-fill. Bounded pool; rethrows the first failure. */
  private[operators] def inParallel(work: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, work.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(work.map(w => Future(w()))), Duration.Inf)
    finally pool.shutdown()
    ()
  }

  /** Train on a reference frame of (doc_id, toks): unigram counts,
    * count-pruned bigram counts, and context totals — UNPRUNED values
    * (the backoff denominator must stay the true count of the context,
    * or kept events would be renormalized against a pruned world) but
    * SEMI-JOINED to the kept bigrams' prevs (r16 follow-up: scoring
    * reads a context ONLY through a kept-bigram hit, so contexts for
    * all-pruned prevs are dead weight — with this, every artifact
    * relation is pruned-bounded, not just the bigrams). */
  def train(ref: DataFrame): PrunedLm = train(ref, materialize = false)

  /** r19: `materialize = true` persists the two AGGREGATED relations
    * everything else derives from (unigram counts, unpruned bigram
    * counts) — both MODEL-sized (reference vocab / observed bigrams),
    * never corpus-sized. The save/load lifecycle runs SEVERAL actions
    * over them (three artifact writes, the consts row, load-time
    * validations), and ReuseExchange dedupes subtrees only WITHIN one
    * action — without the pin each action re-scans and re-aggregates
    * the reference corpus from parquet. The caller owns
    * [[PrunedLm.unpersist]] (a leaked entry could serve a later
    * identical plan from cache, which the bench must never see). */
  private[operators] def train(ref: DataFrame, materialize: Boolean): PrunedLm = {
    val unigrams = ref.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c_w"))
    val bgAll = ref.select(explode(TextAnalysis.bigramPairs("toks")).as("b"))
      .groupBy(col("b.prev").as("prev"), col("b.w").as("w"))
      .agg(count(lit(1)).as("c_pw"))
    val cached = if (materialize) Seq(unigrams.persist(), bgAll.persist()) else Nil
    val bigrams = bgAll.filter(col("c_pw") >= PruneK)
    val contexts = bgAll.groupBy("prev").agg(sum("c_pw").as("c_p"))
      .join(bigrams.select("prev").distinct(), Seq("prev"), "left_semi")
    val row = unigrams.agg(
      coalesce(sum("c_w"), lit(0L)).as("n"), count(lit(1)).as("v")).head()
    PrunedLm(unigrams, bigrams, contexts, row.getLong(0), row.getLong(1),
      PruneK, BackoffAlpha, cached)
  }

  /** Persist the model under `path` (overwrite = retraining replaces
    * the artifact, the versioned-by-path convention). */
  def save(spark: SparkSession, m: PrunedLm, path: String): Unit = {
    import spark.implicits._
    // four independent writes to four distinct dirs — overlapped
    // (guide §2.6): the relations are model-sized, so each write is a
    // small job whose cost is mostly serial scheduling latency
    inParallel(Seq(
      () => m.unigrams.write.mode("overwrite").parquet(s"$path/unigrams"),
      () => m.bigrams.write.mode("overwrite").parquet(s"$path/bigrams"),
      () => m.contexts.write.mode("overwrite").parquet(s"$path/contexts"),
      () => Seq((m.nRef, m.vRef, m.k, m.alpha)).toDF("n_ref", "v_ref", "prune_k", "alpha")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/consts")))
  }

  /** Load a model artifact, re-deriving its invariants LOUD (all
    * checks are model-sized jobs — the model is pruned/bounded by
    * construction, never corpus-scale):
    *
    *   - exactly one consts row, with sane params;
    *   - the unigram relation REPRODUCES the consts (sum c_w = n_ref,
    *     count = v_ref) — the denominators scoring will use must be
    *     the relation's own truth;
    *   - every kept bigram clears the prune threshold (a below-k row
    *     means the artifact does not come from this trainer/params);
    *   - every kept bigram's context exists with c_p ≥ c_pw. */
  def load(spark: SparkSession, path: String): PrunedLm = {
    val cs = spark.read.parquet(s"$path/consts").collect()
    require(cs.length == 1, s"LM artifact at $path: consts must be exactly one row, got ${cs.length}")
    val c = cs(0)
    val (nRef, vRef) = (c.getAs[Long]("n_ref"), c.getAs[Long]("v_ref"))
    val k = c.getAs[Int]("prune_k")
    val alpha = c.getAs[Double]("alpha")
    require(nRef > 0 && vRef > 0, s"LM artifact at $path: empty reference (n_ref=$nRef, v_ref=$vRef)")
    require(k >= 1, s"LM artifact at $path: prune_k must be >= 1, got $k")
    require(alpha > 0 && alpha < 1, s"LM artifact at $path: alpha must be in (0,1), got $alpha")
    val unigrams = spark.read.parquet(s"$path/unigrams")
    val bigrams = spark.read.parquet(s"$path/bigrams")
    val contexts = spark.read.parquet(s"$path/contexts")
    // ONE validation job (r19): the three invariants are independent
    // 1-row aggregates over model-sized relations — union them so the
    // load pays one action's scheduling latency, not three; each check
    // keeps its own loud failure below
    val chk = checkRows(Seq(
      unigrams.agg(lit("u").as("k"),
        coalesce(sum("c_w"), lit(0L)).as("a"), count(lit(1)).as("b")),
      bigrams.agg(lit("badK").as("k"),
        coalesce(sum(when(col("c_pw") < k, 1L).otherwise(0L)), lit(0L)).as("a"),
        lit(0L).as("b")),
      bigrams.join(contexts, Seq("prev"), "left")
        .agg(lit("badCtx").as("k"),
          coalesce(sum(when(col("c_p").isNull || col("c_pw") > col("c_p"), 1L)
            .otherwise(0L)), lit(0L)).as("a"), lit(0L).as("b"))))
    val (uN, uV) = chk("u")
    require(uN == nRef && uV == vRef,
      s"LM artifact at $path: unigram relation does not reproduce the consts " +
        s"(sum=$uN/n_ref=$nRef, count=$uV/v_ref=$vRef) — tampered or mixed artifact")
    val badK = chk("badK")._1
    require(badK == 0,
      s"LM artifact at $path: $badK bigram rows below the prune threshold $k — tampered or mismatched params")
    val badCtx = chk("badCtx")._1
    require(badCtx == 0,
      s"LM artifact at $path: $badCtx kept bigrams with a missing or undersized context — tampered artifact")
    PrunedLm(unigrams, bigrams, contexts, nRef, vRef, k, alpha)
  }

  /** Collect a union of keyed 1-row aggregates `(k, a, b)` in one
    * action; returns k → (a, b). */
  private def checkRows(aggs: Seq[DataFrame]): Map[String, (Long, Long)] =
    aggs.reduce(_.unionAll(_)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** Score a corpus frame of (doc_id, toks) against a pruned model:
    * position 0 scores the Laplace unigram; every later position
    * scores log(c_pw / c_p) on a kept bigram and
    * log(alpha · P_uni(w)) otherwise (pruned and unseen events take
    * the SAME backoff — that is the point of pruning: the model
    * cannot tell them apart, by design). Emits per doc the mean log
    * score, the backed-off event count (the pruning-bite audit), and
    * the event count. */
  def score(docs: DataFrame, m: PrunedLm): DataFrame = {
    val denom = lit((m.nRef + m.vRef + 1).toDouble)
    def puni = (coalesce(col("c_w"), lit(0L)) + lit(1L)) / denom
    val lp0 = docs.select(col("doc_id"), col("toks").getItem(0).as("term"))
      // an empty/whitespace-only doc tokenizes to [''] (split of the
      // trimmed-empty string); without this guard it would score ONE
      // phantom OOV event (r16 review finding) — such docs emit no
      // score row at all instead
      .filter(length(col("term")) > 0)
      .join(m.unigrams, Seq("term"), "left")
      .select(col("doc_id"), log(puni).as("lp"), lit(0).as("bo"))
    val bg = docs.select(col("doc_id"), explode(TextAnalysis.bigramPairs("toks")).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.w").as("w"))
    val lpb = bg.join(m.bigrams, Seq("prev", "w"), "left")
      .join(m.contexts, Seq("prev"), "left")
      .join(m.unigrams.withColumnRenamed("term", "w"), Seq("w"), "left")
      .select(col("doc_id"),
        when(col("c_pw").isNotNull, log(col("c_pw") / col("c_p")))
          .otherwise(log(lit(m.alpha) * puni)).as("lp"),
        when(col("c_pw").isNotNull, lit(0)).otherwise(lit(1)).as("bo"))
    lp0.unionByName(lpb)
      .groupBy("doc_id")
      .agg(round(avg(col("lp")), 4).as("avg_logprob_pb"),
        sum(col("bo")).as("n_backoff"), count(lit(1)).as("n_scored"))
  }

  /** The board query: train on the `lang = 'en'` stratum, SAVE the
    * artifact, LOAD it back (every invariant re-derived — a broken
    * round trip breaks the board), score the whole corpus with the
    * LOADED model. The save/load cycle running inside the oracle-keyed
    * query is the artifact plumbing's proof, the `dedup_incremental`
    * discipline. */
  def lmPruned(t: Tables): DataFrame = {
    val base = t.documents.select(col("doc_id"),
      col("lang"), TextOps.tokens(col("text")).as("toks"))
    TableLifecycle.withScratchTable("graft_lm_pruned") { root =>
      val trained = train(base.filter(col("lang") === "en").select("doc_id", "toks"),
        materialize = true)
      try {
        save(t.spark, trained, root)
        val m = load(t.spark, root)
        TableLifecycle.localize(t.spark,
          score(base.select("doc_id", "toks"), m).orderBy("doc_id"))
      } finally trained.unpersist()
    }
  }

  // ---- the TRIGRAM rung (r16, same session): one step closer to the
  // 5-gram KenLM CCNet ships. Same disciplines as the bigram rung —
  // count-pruned top level, stupid backoff DOWN the ladder
  // (kept trigram → α·kept bigram → α²·Laplace unigram), contexts
  // semi-joined to kept entries so every relation is pruned-bounded,
  // artifacts validated loud on load.

  /** A pruned trigram model: the bigram rung plus the kept-trigram and
    * trigram-context relations. */
  final case class PrunedLm3(base: PrunedLm, trigrams: DataFrame, tcontexts: DataFrame)

  def train3(ref: DataFrame): PrunedLm3 = train3(ref, materialize = false)

  private[operators] def train3(ref: DataFrame, materialize: Boolean): PrunedLm3 = {
    val base = train(ref, materialize)
    val tgAll = ref.select(explode(TextAnalysis.trigramTriples("toks")).as("b"))
      .groupBy(col("b.p2").as("p2"), col("b.p1").as("p1"), col("b.w").as("w"))
      .agg(count(lit(1)).as("c_t"))
    val cached = if (materialize) Seq(tgAll.persist()) else Nil
    val trigrams = tgAll.filter(col("c_t") >= PruneK)
    val tcontexts = tgAll.groupBy("p2", "p1").agg(sum("c_t").as("c_tp"))
      .join(trigrams.select("p2", "p1").distinct(), Seq("p2", "p1"), "left_semi")
    PrunedLm3(base.copy(cached = base.cached ++ cached), trigrams, tcontexts)
  }

  def save3(spark: SparkSession, m: PrunedLm3, path: String): Unit = {
    import spark.implicits._
    // all six artifact writes overlapped (same rationale as [[save]])
    inParallel(Seq(
      () => m.base.unigrams.write.mode("overwrite").parquet(s"$path/unigrams"),
      () => m.base.bigrams.write.mode("overwrite").parquet(s"$path/bigrams"),
      () => m.base.contexts.write.mode("overwrite").parquet(s"$path/contexts"),
      () => Seq((m.base.nRef, m.base.vRef, m.base.k, m.base.alpha))
        .toDF("n_ref", "v_ref", "prune_k", "alpha")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/consts"),
      () => m.trigrams.write.mode("overwrite").parquet(s"$path/trigrams"),
      () => m.tcontexts.write.mode("overwrite").parquet(s"$path/tcontexts")))
  }

  /** [[load]] plus the trigram invariants: every kept trigram clears
    * the prune threshold and has its context with c_tp ≥ c_t. */
  def load3(spark: SparkSession, path: String): PrunedLm3 = {
    val base = load(spark, path)
    val trigrams = spark.read.parquet(s"$path/trigrams")
    val tcontexts = spark.read.parquet(s"$path/tcontexts")
    // both trigram invariants in one job (the [[load]] discipline)
    val chk = checkRows(Seq(
      trigrams.agg(lit("badK").as("k"),
        coalesce(sum(when(col("c_t") < base.k, 1L).otherwise(0L)), lit(0L)).as("a"),
        lit(0L).as("b")),
      trigrams.join(tcontexts, Seq("p2", "p1"), "left")
        .agg(lit("badCtx").as("k"),
          coalesce(sum(when(col("c_tp").isNull || col("c_t") > col("c_tp"), 1L)
            .otherwise(0L)), lit(0L)).as("a"), lit(0L).as("b"))))
    val badK = chk("badK")._1
    require(badK == 0,
      s"LM artifact at $path: $badK trigram rows below the prune threshold ${base.k}")
    val badCtx = chk("badCtx")._1
    require(badCtx == 0,
      s"LM artifact at $path: $badCtx kept trigrams with a missing or undersized context")
    PrunedLm3(base, trigrams, tcontexts)
  }

  /** Score with the trigram rung: position 0 the Laplace unigram,
    * position 1 the bigram rung, positions ≥ 2 the full ladder —
    * kept trigram log(c_t/c_tp), else α · (kept bigram c_pw/c_p, else
    * α · P_uni). `n_backoff` counts events whose TOP-level model
    * missed. */
  def score3(docs: DataFrame, m: PrunedLm3): DataFrame = {
    val b = m.base
    val denom = lit((b.nRef + b.vRef + 1).toDouble)
    def puni = (coalesce(col("c_w"), lit(0L)) + lit(1L)) / denom
    val lp0 = docs.select(col("doc_id"), col("toks").getItem(0).as("term"))
      .filter(length(col("term")) > 0) // no phantom event for empty docs
      .join(b.unigrams, Seq("term"), "left")
      .select(col("doc_id"), log(puni).as("lp"), lit(0).as("bo"))
    val bgPos = docs.select(col("doc_id"), posexplode(TextAnalysis.bigramPairs("toks")))
      .select(col("doc_id"), col("pos"), col("col.prev").as("prev"), col("col.w").as("w"))
    val lp1 = bgPos.filter(col("pos") === 0)
      .join(b.bigrams, Seq("prev", "w"), "left")
      .join(b.contexts, Seq("prev"), "left")
      .join(b.unigrams.withColumnRenamed("term", "w"), Seq("w"), "left")
      .select(col("doc_id"),
        when(col("c_pw").isNotNull, log(col("c_pw") / col("c_p")))
          .otherwise(log(lit(b.alpha) * puni)).as("lp"),
        when(col("c_pw").isNotNull, lit(0)).otherwise(lit(1)).as("bo"))
    val tg = docs.select(col("doc_id"), explode(TextAnalysis.trigramTriples("toks")).as("b"))
      .select(col("doc_id"), col("b.p2").as("p2"), col("b.p1").as("p1"), col("b.w").as("w"))
    val lp2 = tg.join(m.trigrams, Seq("p2", "p1", "w"), "left")
      .join(m.tcontexts, Seq("p2", "p1"), "left")
      .join(b.bigrams.withColumnRenamed("prev", "p1"), Seq("p1", "w"), "left")
      .join(b.contexts.withColumnRenamed("prev", "p1"), Seq("p1"), "left")
      .join(b.unigrams.withColumnRenamed("term", "w"), Seq("w"), "left")
      .select(col("doc_id"),
        when(col("c_t").isNotNull, log(col("c_t") / col("c_tp")))
          .when(col("c_pw").isNotNull, log(lit(b.alpha) * col("c_pw") / col("c_p")))
          .otherwise(log(lit(b.alpha) * lit(b.alpha) * puni)).as("lp"),
        when(col("c_t").isNotNull, lit(0)).otherwise(lit(1)).as("bo"))
    lp0.unionByName(lp1).unionByName(lp2)
      .groupBy("doc_id")
      .agg(round(avg(col("lp")), 4).as("avg_logprob_pb3"),
        sum(col("bo")).as("n_backoff"), count(lit(1)).as("n_scored"))
  }

  /** The trigram-rung board query — same train→save→load→score
    * artifact loop as [[lmPruned]]. */
  def lmPruned3(t: Tables): DataFrame = {
    val base = t.documents.select(col("doc_id"),
      col("lang"), TextOps.tokens(col("text")).as("toks"))
    TableLifecycle.withScratchTable("graft_lm_pruned3") { root =>
      val trained = train3(base.filter(col("lang") === "en").select("doc_id", "toks"),
        materialize = true)
      try {
        save3(t.spark, trained, root)
        val m = load3(t.spark, root)
        TableLifecycle.localize(t.spark,
          score3(base.select("doc_id", "toks"), m).orderBy("doc_id"))
      } finally trained.base.unpersist()
    }
  }

  val lmPruned3Sql: String = {
    val toks = TextOps.sqlTokens("text")
    val puni = "(coalesce(c_w, 0) + 1) / CAST(n_ref + v_ref + 1 AS DOUBLE)"
    s"""WITH base AS (SELECT doc_id, lang, $toks AS toks FROM documents),
       |rterms AS (SELECT unnest(toks) AS term FROM base WHERE lang = 'en'),
       |vocab AS (SELECT term, count(*) AS c_w FROM rterms GROUP BY term),
       |consts AS (SELECT sum(c_w) AS n_ref, count(*) AS v_ref FROM vocab),
       |rbg AS (SELECT toks[i] AS prev, toks[i + 1] AS w
       |        FROM (SELECT toks, unnest(range(1, greatest(len(toks), 1))) AS i
       |              FROM base WHERE lang = 'en')),
       |bgc AS (SELECT prev, w, count(*) AS c_pw FROM rbg GROUP BY prev, w),
       |pc AS (SELECT prev, sum(c_pw) AS c_p FROM bgc GROUP BY prev),
       |kept AS (SELECT prev, w, c_pw FROM bgc WHERE c_pw >= $PruneK),
       |rtg AS (SELECT toks[i] AS p2, toks[i + 1] AS p1, toks[i + 2] AS w
       |        FROM (SELECT toks, unnest(range(1, greatest(len(toks) - 1, 1))) AS i
       |              FROM base WHERE lang = 'en')),
       |tgc AS (SELECT p2, p1, w, count(*) AS c_t FROM rtg GROUP BY p2, p1, w),
       |tpc AS (SELECT p2, p1, sum(c_t) AS c_tp FROM tgc GROUP BY p2, p1),
       |kept3 AS (SELECT p2, p1, w, c_t FROM tgc WHERE c_t >= $PruneK),
       |bg AS (SELECT doc_id, i - 1 AS pos, toks[i] AS prev, toks[i + 1] AS w
       |       FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks), 1))) AS i
       |             FROM base)),
       |tg AS (SELECT doc_id, toks[i] AS p2, toks[i + 1] AS p1, toks[i + 2] AS w
       |       FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - 1, 1))) AS i
       |             FROM base)),
       |lp0 AS (SELECT doc_id, ln($puni) AS lp, 0 AS bo
       |        FROM (SELECT doc_id, toks[1] AS term FROM base
       |              WHERE length(toks[1]) > 0) t
       |             LEFT JOIN vocab USING (term) CROSS JOIN consts),
       |lp1 AS (SELECT doc_id,
       |          CASE WHEN c_pw IS NOT NULL THEN ln(c_pw / c_p)
       |               ELSE ln($BackoffAlpha::DOUBLE * $puni) END AS lp,
       |          CASE WHEN c_pw IS NOT NULL THEN 0 ELSE 1 END AS bo
       |        FROM (SELECT doc_id, prev, w FROM bg WHERE pos = 0) b
       |             LEFT JOIN kept USING (prev, w) LEFT JOIN pc USING (prev)
       |             LEFT JOIN (SELECT term AS w, c_w FROM vocab) v USING (w)
       |             CROSS JOIN consts),
       |lp2 AS (SELECT doc_id,
       |          CASE WHEN c_t IS NOT NULL THEN ln(c_t / c_tp)
       |               WHEN c_pw IS NOT NULL THEN ln($BackoffAlpha::DOUBLE * c_pw / c_p)
       |               ELSE ln($BackoffAlpha::DOUBLE * $BackoffAlpha::DOUBLE * $puni) END AS lp,
       |          CASE WHEN c_t IS NOT NULL THEN 0 ELSE 1 END AS bo
       |        FROM tg LEFT JOIN kept3 USING (p2, p1, w) LEFT JOIN tpc USING (p2, p1)
       |             LEFT JOIN (SELECT prev AS p1, w, c_pw FROM kept) k2 USING (p1, w)
       |             LEFT JOIN (SELECT prev AS p1, c_p FROM pc) p2c USING (p1)
       |             LEFT JOIN (SELECT term AS w, c_w FROM vocab) v USING (w)
       |             CROSS JOIN consts)
       |SELECT doc_id, round(avg(lp), 4) AS avg_logprob_pb3,
       |       CAST(sum(bo) AS BIGINT) AS n_backoff, count(*) AS n_scored
       |FROM (SELECT * FROM lp0 UNION ALL SELECT * FROM lp1 UNION ALL SELECT * FROM lp2)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** The bigram-rung training + scoring CTE chain through a `scored`
    * relation, parameterized over the TRAINING relation `refRel` and
    * the SCORING relation `scoreRel` (both `(doc_id, toks)`) — shared
    * by [[lmPrunedSql]]/[[pplRefSampleSql]] (train on the `en`
    * stratum, score the whole corpus) and the funnel's ppl gate
    * (r17: train on the en stratum, score ONLY the stage-5
    * survivors — the prior gates shrink the scoring bill). */
  private[operators] def coreSqlOver(refRel: String, scoreRel: String): String = {
    val puni = "(coalesce(c_w, 0) + 1) / CAST(n_ref + v_ref + 1 AS DOUBLE)"
    s"""rterms AS (SELECT unnest(toks) AS term FROM $refRel),
       |vocab AS (SELECT term, count(*) AS c_w FROM rterms GROUP BY term),
       |consts AS (SELECT sum(c_w) AS n_ref, count(*) AS v_ref FROM vocab),
       |rbg AS (SELECT toks[i] AS prev, toks[i + 1] AS w
       |        FROM (SELECT toks, unnest(range(1, greatest(len(toks), 1))) AS i
       |              FROM $refRel)),
       |bgc AS (SELECT prev, w, count(*) AS c_pw FROM rbg GROUP BY prev, w),
       |pc AS (SELECT prev, sum(c_pw) AS c_p FROM bgc GROUP BY prev),
       |kept AS (SELECT prev, w, c_pw FROM bgc WHERE c_pw >= $PruneK),
       |bg AS (SELECT doc_id, toks[i] AS prev, toks[i + 1] AS w
       |       FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks), 1))) AS i
       |             FROM $scoreRel)),
       |lp0 AS (SELECT doc_id, ln($puni) AS lp, 0 AS bo
       |        FROM (SELECT doc_id, toks[1] AS term FROM $scoreRel
       |              WHERE length(toks[1]) > 0) t
       |             LEFT JOIN vocab USING (term) CROSS JOIN consts),
       |lpb AS (SELECT doc_id,
       |          CASE WHEN c_pw IS NOT NULL THEN ln(c_pw / c_p)
       |               ELSE ln($BackoffAlpha::DOUBLE * $puni) END AS lp,
       |          CASE WHEN c_pw IS NOT NULL THEN 0 ELSE 1 END AS bo
       |        FROM bg LEFT JOIN kept USING (prev, w) LEFT JOIN pc USING (prev)
       |             LEFT JOIN (SELECT term AS w, c_w FROM vocab) v USING (w)
       |             CROSS JOIN consts),
       |scored AS (SELECT doc_id, round(avg(lp), 4) AS avg_logprob_pb,
       |             CAST(sum(bo) AS BIGINT) AS n_backoff, count(*) AS n_scored
       |           FROM (SELECT * FROM lp0 UNION ALL SELECT * FROM lpb)
       |           GROUP BY doc_id)""".stripMargin
  }

  private val lmPrunedCoreSql: String = {
    val toks = TextOps.sqlTokens("text")
    s"""base AS (SELECT doc_id, lang, $toks AS toks FROM documents),
       |lmref AS (SELECT doc_id, toks FROM base WHERE lang = 'en'),
       |""".stripMargin + coreSqlOver("lmref", "base")
  }

  /** DuckDB mirror: the same training (prune at [[PruneK]]) and the
    * same stupid-backoff expression tree, recomputed straight from
    * `documents` — the oracle checks the MATH; the Spark side's
    * artifact round trip must land on the identical hash. */
  val lmPrunedSql: String =
    s"""WITH $lmPrunedCoreSql
       |SELECT doc_id, avg_logprob_pb, n_backoff, n_scored
       |FROM scored ORDER BY doc_id""".stripMargin

  /** Per-bucket keep percentages — the CCNet split: keep the fluent
    * head wholesale, downweight the middle, keep a residual tail.
    * Shared with the funnel's ppl gate (r17). */
  private[operators] val RefKeepPct = Seq("head" -> 100, "middle" -> 50, "tail" -> 10)

  /** Thirds assignment + per-bucket keep draw over a `(doc_id, s)`
    * score relation: cutpoints from the exact cumulative histogram of
    * the 4dp scores (`text_ppl_buckets`' discipline — distinct rounded
    * scores are a BOUNDED relation, so the one global window runs over
    * kilobytes, never a corpus sort), bucket by the cuts, keep-draw
    * with the portable md5 rule under `salt`. Returns `(doc_id, s,
    * bucket, keep)`. Shared by [[pplRefSample]] and the funnel's ppl
    * gate (r17), which draw with different salts. */
  private[operators] def bucketKeep(scores: DataFrame, salt: String): DataFrame = {
    val n = scores.agg(count(lit(1)).as("n_docs"))
    val hist = scores.groupBy("s").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("s").desc).rowsBetween(Long.MinValue, 0)
    val cum = hist.select(col("s"), sum(col("c")).over(w).as("cum"))
      .crossJoin(broadcast(n))
    val cuts = cum.agg(
      max(when(col("cum") >= ceil(col("n_docs") / lit(3.0)), col("s"))).as("c_head"),
      max(when(col("cum") >= ceil(col("n_docs") * lit(2.0) / lit(3.0)), col("s"))).as("c_mid"))
    val keepPct = RefKeepPct.tail.foldLeft(
      when(col("bucket") === RefKeepPct.head._1, lit(RefKeepPct.head._2))) {
      case (acc, (bk, p)) => acc.when(col("bucket") === bk, lit(p))
    }
    scores.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("s"),
        when(col("s") >= col("c_head"), lit("head"))
          .when(col("s") >= col("c_mid"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .withColumn("keep",
        (graft.functions.Hashing.md5Long(concat(lit(salt), col("doc_id"))) % 100
          < keepPct).cast("int"))
  }

  /** The SQL mirror of [[bucketKeep]]: CTEs `bkn/bkhist/bkcum/bkcuts/
    * bkassign` ending in `bucketed(doc_id, s, bucket, keep)` over the
    * score relation `scRel(doc_id, s)`. */
  private[operators] def bucketKeepSqlOver(scRel: String, salt: String): String = {
    val keepPct = RefKeepPct.map { case (b, p) => s"WHEN '$b' THEN $p" }
      .mkString("CASE bucket ", " ", " END")
    s"""bkn AS (SELECT count(*) AS n_docs FROM $scRel),
       |bkhist AS (SELECT s, count(*) AS c FROM $scRel GROUP BY s),
       |bkcum AS (SELECT s, sum(c) OVER (ORDER BY s DESC
       |                                 ROWS UNBOUNDED PRECEDING) AS cum
       |          FROM bkhist),
       |bkcuts AS (SELECT max(CASE WHEN cum >= ceil(n_docs / 3.0) THEN s END) AS c_head,
       |                  max(CASE WHEN cum >= ceil(n_docs * 2.0 / 3.0) THEN s END) AS c_mid
       |           FROM bkcum CROSS JOIN bkn),
       |bkassign AS (SELECT doc_id, s,
       |               CASE WHEN s >= c_head THEN 'head'
       |                    WHEN s >= c_mid THEN 'middle'
       |                    ELSE 'tail' END AS bucket
       |             FROM $scRel CROSS JOIN bkcuts),
       |bucketed AS (SELECT doc_id, s, bucket,
       |               CASE WHEN ${graft.functions.Hashing.sqlMd5Long(s"concat('$salt', doc_id)")} % 100
       |                         < $keepPct THEN 1 ELSE 0 END AS keep
       |             FROM bkassign)""".stripMargin
  }

  /** The COMPOSED CCNet loop on the PRUNED reference model (r16): the
    * production pipeline in one query — train the pruned stupid-backoff
    * LM on the reference stratum, score the WHOLE corpus, split into
    * HEAD/MIDDLE/TAIL thirds by the exact cumulative histogram of the
    * 4dp scores (`text_ppl_buckets`' discipline: distinct rounded
    * scores are a bounded relation, so the one window runs over
    * kilobytes — never a global sort), and keep-draw per bucket with
    * the portable md5 rule. `text_ppl_buckets`/`text_ppl_sample` run
    * this loop on the IN-CORPUS bigram LM; this key swaps in the model
    * CCNet actually deploys — reference-trained, pruned, bounded —
    * so the whole filter chain a 100-TB run executes is pinned under
    * one oracle hash. Output: the per-bucket audit (docs seen / kept /
    * kept fluency mass). */
  def pplRefSample(t: Tables): DataFrame = {
    val base = t.documents.select(col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("toks"))
    val m = train(base.filter(col("lang") === "en").select("doc_id", "toks"))
    val scores = score(base.select("doc_id", "toks"), m)
      .select(col("doc_id"), col("avg_logprob_pb").as("s"))
    bucketKeep(scores, "pplref:")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"),
        round(sum(col("s") * col("keep")), 4).as("kept_logprob_mass"))
      .orderBy("bucket")
  }

  val pplRefSampleSql: String =
    s"""WITH $lmPrunedCoreSql,
       |sc AS (SELECT doc_id, avg_logprob_pb AS s FROM scored),
       |${bucketKeepSqlOver("sc", "pplref:")}
       |SELECT bucket, count(*) AS n_docs,
       |       CAST(sum(keep) AS BIGINT) AS n_kept,
       |       round(sum(s * keep), 4) AS kept_logprob_mass
       |FROM bucketed
       |GROUP BY bucket ORDER BY bucket""".stripMargin
}
