package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization and shingling shared by text analysis + dedup, with exact
  * DuckDB SQL mirrors (the oracle must reproduce every intermediate).
  *
  * Everything is built from engine-portable primitives: lower/trim,
  * single-space split, word 3-gram shingles. Spark arrays are 0-indexed,
  * DuckDB lists 1-indexed — the mirrors account for that.
  */
object TextOps {

  /** Whitespace-collapsed, lower-cased normalization. */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  def sqlNormText(expr: String): String =
    s"lower(trim(regexp_replace($expr, '\\s+', ' ', 'g')))"

  /** Tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  def sqlTokens(expr: String): String = s"string_split(${sqlNormText(expr)}, ' ')"

  /** Word 3-gram shingles (empty array below 3 tokens). */
  def shingles(toksCol: String): Column = expr(
    s"""CASE WHEN size($toksCol) >= 3
       |  THEN transform(sequence(0, size($toksCol) - 3),
       |                 i -> concat($toksCol[i], ' ', $toksCol[i+1], ' ', $toksCol[i+2]))
       |  ELSE array() END""".stripMargin)

  /** DuckDB mirror of [[shingles]] over a list-typed column/expr. */
  def sqlShingles(toksExpr: String): String =
    s"""list_transform(range(1, greatest(len($toksExpr) - 1, 1)),
       |               i -> concat($toksExpr[i], ' ', $toksExpr[i+1], ' ', $toksExpr[i+2]))""".stripMargin

  // ---- row-local web-pipeline primitives (public API, r15) ---------------
  // Promoted from the operators that first shipped them (the r14 verdict:
  // "the most reusable row-local primitives in the codebase are locked
  // behind the package") — callable on any column, and registered as SQL
  // functions `url_canonicalize` / `html_main_text` / `html_visible_text`
  // / `text_model_score` via graft.plans.GraftExtensions.

  /** Canonical form of a URL — the key of URL-level dedup, the FIRST
    * dedup step of every real web pipeline: scheme/host case-fold,
    * default-port strip (:80 http / :443 https only), fragment strip,
    * tracking-param removal (utm_*, gclid, fbclid — including the
    * VALUELESS `?fbclid` share-link form), query-param sort, and
    * trailing-slash normalization. Entirely codegen'd string algebra:
    * runs inside the scan stage at any scale. */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, lit("#.*$"), lit(""))
    val pre = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*", 0)
    val tail = noFrag.substr(length(pre) + 1, length(noFrag))
    val preLc = lower(pre)
    val preNoPort = when(preLc.startsWith("https://"), regexp_replace(preLc, lit(":443$"), lit("")))
      .when(preLc.startsWith("http://"), regexp_replace(preLc, lit(":80$"), lit("")))
      .otherwise(preLc)
    val path0 = regexp_extract(tail, "^[^?]*", 0)
    val path = when(path0 === "" || path0 === "/", lit("/"))
      .otherwise(regexp_replace(path0, lit("/+$"), lit("")))
    val query0 = regexp_extract(tail, "\\?(.*)$", 1)
    // (=|$): share links carry VALUELESS click ids (`?fbclid`) too —
    // requiring the '=' would let them split duplicate pages apart
    val kept = filter(split(query0, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)(=|$)"))
    val query = array_join(array_sort(kept), "&")
    concat(preNoPort, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Payload blocks dropped first (their bodies may contain fake
    * tags), one regex per tag — RE2-compatible (no backreferences). */
  private def dropBlock(c: Column, tag: String): Column =
    regexp_replace(c, lit(s"(?s)<$tag[^>]*>.*?</$tag>"), lit(" "))

  /** Tag strip + entity decode + whitespace squeeze over an
    * already-extracted HTML fragment. */
  private def cleanFragment(c: Column): Column = {
    val noTags = regexp_replace(c, lit("<[^>]*>"), lit(" "))
    // &amp; decodes LAST so '&amp;lt;' renders '&lt;', not '<'
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }
    trim(regexp_replace(decoded, lit("\\s+"), lit(" ")))
  }

  /** The main-content block's visible text (`<div id="main">…</div>`,
    * script/style payloads removed first) — the trafilatura/jusText-
    * shaped step BEFORE every text filter in a real web pipeline.
    * A row-local regex state machine, NOT a parser: nested same-tag
    * blocks inside main defeat the non-greedy close (documented; real
    * heuristic extractors accept the same error class). */
  def htmlMainText(html: Column): Column = {
    val noPayload = dropBlock(dropBlock(html, "script"), "style")
    cleanFragment(regexp_extract(noPayload, "(?s)<div id=\"main\">(.*?)</div>", 1))
  }

  /** The whole page's visible text: script/style payloads and
    * nav/footer boilerplate blocks removed, tags stripped, entities
    * decoded, whitespace squeezed. */
  def htmlVisibleText(html: Column): Column = {
    val noPayload = dropBlock(dropBlock(html, "script"), "style")
    cleanFragment(dropBlock(dropBlock(noPayload, "nav"), "footer"))
  }

  /** Stopword list of the heuristic quality composite — one shared
    * definition for the board gate, the dedup survivor selection, and
    * the public face below. */
  val QualityStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

  /** The heuristic QUALITY composite (Gopher/C4-style rule gate):
    * 0.3·length-score + 0.3·stopword-ratio + 0.4·alpha-ratio, rounded
    * to 4dp — the score `text_quality` keeps by and `dedup_survivors`
    * ranks cluster members with. SQL face: `text_quality_score`.
    * Row-local, codegen'd, scan-stage cost at any scale. */
  def qualityScore(text: Column): Column = qualityScoreFrom(text, tokens(text))

  /** [[qualityScore]] over an ALREADY-TOKENIZED column — the form for
    * callers that carry a shared `toks` projection (r16: the board
    * query computed `toks` once for its ratio columns and then paid a
    * SECOND regex+split inside `qualityScore(text)`; codegen's
    * subexpression elimination does not cross the alias, and the
    * isolated re-measure put the duplicate at ~2× the scan cost).
    * `toks` MUST be [[tokens]] of `text` — the one-line delegation
    * above is the definition of that contract. */
  def qualityScoreFrom(text: Column, toks: Column): Column = {
    val nToks = size(toks).cast("double")
    val stopRatio = size(filter(toks, t => t.isInCollection(QualityStopwords))) / nToks
    val alphaRatio =
      length(regexp_replace(lower(text), "[^a-z]", "")) / length(text).cast("double")
    val lenScore = least(lit(1.0), nToks / lit(100.0))
    round(lenScore * 0.3 + stopRatio * 0.3 + alphaRatio * 0.4, 4)
  }

  /** fastText-shaped model score over a text column: tokens hash into
    * `buckets` features, the per-doc MEAN feature weight passes through
    * a sigmoid (temperature 4). `weights = None` scores with
    * deterministic md5 pseudo-weights (the no-artifact fallback — same
    * formula the DuckDB oracle replays bit-for-bit); `Some(w)` scores
    * against a REAL exported weight vector shipped as a broadcast
    * literal array (`element_at` lookup) — the SAME plan shape, one
    * shuffle-free projection inside the scan stage. Load an artifact
    * with [[modelWeights]]. */
  def modelScore(text: Column, weights: Option[Seq[Double]] = None,
      buckets: Int = 64): Column =
    lit(1.0) / (lit(1.0) + exp(modelFeatureMean(text, weights, buckets) * -4.0))

  /** The mean hashed-feature weight [[modelScore]] sigmoids — exposed so
    * gates that report the raw linear response (the board query does)
    * share one definition. Duplicating it next to the score in a
    * projection is fine: codegen's common-subexpression elimination
    * computes it once. */
  def modelFeatureMean(text: Column, weights: Option[Seq[Double]] = None,
      buckets: Int = 64): Column = {
    require(buckets > 0, s"modelScore needs a positive bucket count, got $buckets")
    weights.foreach(w => require(w.size == buckets,
      s"weight vector has ${w.size} entries for $buckets buckets"))
    val toks = tokens(text)
    def bucket(tok: Column): Column =
      Hashing.md5Long(concat(lit("qmb:"), tok)) % buckets
    def weightOf(b: Column): Column = weights match {
      case None =>
        (Hashing.md5Long(concat(lit("qmw:"), b.cast("string"))) % 2001) / lit(1000.0) - 1.0
      case Some(w) => element_at(typedLit(w), b.cast("int") + 1)
    }
    val featureSum = aggregate(transform(toks, tok => weightOf(bucket(tok))),
      lit(0.0), (acc, x) => acc + x)
    featureSum / greatest(size(toks), lit(1)).cast("double")
  }

  /** The md5 pseudo-weight vector [[modelScore]] uses when no artifact
    * is given, MATERIALIZED (driver-side, `buckets` entries) — feeding
    * it back through the `weights = Some(...)` path must reproduce the
    * pseudo path bit-for-bit, which is how the board proves the real
    * array plumbing. */
  def pseudoWeights(buckets: Int = 64): Seq[Double] =
    (0 until buckets).map(b => (Hashing.md5LongLocal(s"qmw:$b") % 2001) / 1000.0 - 1.0)

  /** Load a PER-LANGUAGE hashed-feature model artifact (r16): a parquet
    * or CSV (header `lang,bucket,w_milli`) table of integer-milli
    * weights → one dense vector per language, the form the fastText-
    * shaped language classifier broadcasts. Integer millis on purpose:
    * the classifier ARGMAXes a sum, and summing longs is exact and
    * order-independent where a double sum could flip near-ties between
    * engines. Bounded driver collect BY CONTRACT (|langs| × buckets
    * rows). Every (lang, bucket) pair must be present exactly once. */
  def langModelWeights(spark: org.apache.spark.sql.SparkSession, path: String,
      langs: Seq[String], buckets: Int): Map[String, IndexedSeq[Long]] = {
    val raw =
      if (path.endsWith(".csv")) spark.read.option("header", "true").csv(path)
      else spark.read.parquet(path)
    val rows = raw.select(col("lang"), col("bucket").cast("int"),
        col("w_milli").cast("long"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    require(rows.length == langs.size * buckets,
      s"lang-model artifact at $path has ${rows.length} rows for " +
        s"${langs.size} langs x $buckets buckets")
    val byLang = rows.groupBy(_._1)
    require(byLang.keySet == langs.toSet,
      s"lang-model artifact at $path covers langs ${byLang.keySet.toSeq.sorted}, " +
        s"expected ${langs.sorted}")
    langs.map { l =>
      val m = byLang(l).map(t => t._2 -> t._3).toMap
      require(m.size == buckets, s"lang-model artifact at $path repeats a bucket for $l")
      l -> (0 until buckets).map(b => m.getOrElse(b,
        sys.error(s"lang-model artifact at $path is missing bucket $b for $l"))).toIndexedSeq
    }.toMap
  }

  /** Load a model-weight artifact: a parquet or CSV (header `bucket,
    * weight`) table of (bucket, weight) rows → the dense vector
    * [[modelScore]] takes. Bounded driver collect BY CONTRACT — a
    * hashed-feature linear model is small by construction (fastText
    * quantizes to ~2M buckets; far below collect limits). Every bucket
    * in [0, buckets) must be present exactly once. */
  def modelWeights(spark: org.apache.spark.sql.SparkSession, path: String,
      buckets: Int = 64): Seq[Double] = {
    val raw =
      if (path.endsWith(".csv")) spark.read.option("header", "true").csv(path)
      else spark.read.parquet(path)
    val rows = raw.select(col("bucket").cast("int"), col("weight").cast("double"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    require(rows.length == buckets,
      s"weight artifact at $path has ${rows.length} rows for $buckets buckets")
    val m = rows.toMap
    require(m.size == buckets, s"weight artifact at $path repeats a bucket")
    (0 until buckets).map(b => m.getOrElse(b,
      sys.error(s"weight artifact at $path is missing bucket $b")))
  }
}
