package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** The r15 public promotion of the row-local web-pipeline primitives:
  * the Scala API (`TextOps.canonicalUrl` / `htmlMainText` /
  * `htmlVisibleText` / `modelScore`) and their SQL registrations
  * (`url_canonicalize`, `html_main_text`, `html_visible_text`,
  * `text_model_score`) must be the same function — and the model gate's
  * pseudo-weight and real-artifact paths must agree bit-for-bit on the
  * same shuffle-free plan. */
class TextOpsFunctionsSpec extends SparkSpec {

  private def one(sql: String): String =
    spark.sql(sql).collect()(0).getString(0)

  test("url_canonicalize: SQL face = Scala API, rule table pinned") {
    val cases = Seq(
      "https://Example.COM:443/path/?b=2&a=1&utm_source=x#frag" -> "https://example.com/path?a=1&b=2",
      "HTTP://example.com:80" -> "http://example.com/",
      "https://example.com/p?fbclid" -> "https://example.com/p",
      "https://example.com/p?gclid=9&x=1" -> "https://example.com/p?x=1")
    cases.foreach { case (in, want) =>
      assert(one(s"SELECT url_canonicalize('$in')") === want, s"SQL face on $in")
    }
    import spark.implicits._
    val viaScala = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalUrl(col("u"))).as[String].collect().toSeq
    assert(viaScala === cases.map(_._2), "Scala API must match the same rule table")
  }

  test("html_main_text / html_visible_text: SQL face = Scala API on an adversarial page") {
    val page = "<html><head><script>if(1<2){v=\"</div>\";}</script></head><body>" +
      "<nav>Home | Login</nav><div id=\"main\"><p>Real &amp; body</p></div>" +
      "<footer>(c) corp</footer></body></html>"
    import spark.implicits._
    val df = Seq(page).toDF("page")
    val main = df.select(TextOps.htmlMainText(col("page"))).as[String].head()
    val visible = df.select(TextOps.htmlVisibleText(col("page"))).as[String].head()
    assert(main === "Real & body")
    assert(visible === "Real & body", "nav/footer must drop from the visible text")
    df.createOrReplaceTempView("pg")
    assert(one("SELECT html_main_text(page) FROM pg") === main)
    assert(one("SELECT html_visible_text(page) FROM pg") === visible)
  }

  test("modelScore: pseudo path = materialized-array path, bit-for-bit, both shuffle-free") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val viaPseudo = docs.select(col("doc_id"), TextOps.modelScore(col("text")).as("s"))
    val viaArray = docs.select(col("doc_id"),
      TextOps.modelScore(col("text"), Some(TextOps.pseudoWeights())).as("s"))
    val p = viaPseudo.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = viaArray.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p.nonEmpty && p === a,
      "the md5 pseudo-weights fed back as a broadcast array must reproduce the pseudo path")
    // both paths: ONE projection over the scan — no Exchange anywhere
    Seq("pseudo" -> viaPseudo, "array" -> viaArray).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name path must stay shuffle-free:\n$plan")
    }
    // SQL face rides the pseudo path
    docs.createOrReplaceTempView("docs_ms")
    val viaSql = spark.sql("SELECT doc_id, text_model_score(text) AS s FROM docs_ms")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql === p)
  }

  test("text_quality_score: SQL face = the board gate's composite, row for row") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val board = SparkEntry.queries("text_quality")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    docs.createOrReplaceTempView("docs_qs")
    val viaSql = spark.sql("SELECT doc_id, text_quality_score(text) AS q FROM docs_qs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql.nonEmpty && viaSql === board,
      "the public SQL face must reproduce the board's quality_score bit-for-bit")
    val viaScala = docs.select(col("doc_id"), TextOps.qualityScore(col("text")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaScala === board)
  }

  test("modelWeights loader: parquet and CSV artifacts round-trip; gaps fail loud") {
    import spark.implicits._
    val w = TextOps.pseudoWeights()
    val dir = java.nio.file.Files.createTempDirectory("modelw").toString
    val rows = w.zipWithIndex.map { case (v, b) => (b, v) }
    rows.toDF("bucket", "weight").write.parquet(s"$dir/w.parquet")
    assert(TextOps.modelWeights(spark, s"$dir/w.parquet") === w)
    rows.toDF("bucket", "weight").coalesce(1)
      .write.option("header", "true").csv(s"$dir/w.csv")
    assert(TextOps.modelWeights(spark, s"$dir/w.csv") === w)
    rows.drop(1).toDF("bucket", "weight").write.parquet(s"$dir/gap.parquet")
    val e = intercept[Exception](TextOps.modelWeights(spark, s"$dir/gap.parquet"))
    assert(e.getMessage.contains("63 rows") || e.getMessage.contains("missing"),
      s"a gapped artifact must fail loud: ${e.getMessage}")
  }

  test("interpolated bigram LM: hand-computed fixture (position 0 unigram, rest Jelinek-Mercer)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lmbg").toString
    Seq((1L, "a b a b", "en", "s", 7L), (2L, "a a", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.lmBigram(graft.sources.Tables(spark, dir))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // corpus: N=6, c(a)=4, c(b)=2; bigrams c(a,b)=2, c(b,a)=1, c(a,a)=1;
    // continuation mass c(a,·)=3, c(b,·)=1
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpUniA = math.log(4.0 / 6)
    val lpAB = math.log(0.9 * 2 / 3 + 0.1 * (2.0 / 6))
    val lpBA = math.log(0.9 * 1 / 1 + 0.1 * (4.0 / 6))
    val lpAA = math.log(0.9 * 1 / 3 + 0.1 * (4.0 / 6))
    assert(got(1L) === ((r4((lpUniA + lpAB + lpBA + lpAB) / 4), 4L)))
    assert(got(2L) === ((r4((lpUniA + lpAA) / 2), 2L)))

    // the trigram rung on the same fixture: trigrams (a,b,a) and (b,a,b)
    // each once, contexts (a,b)/(b,a) each once
    val tg = graft.operators.TextAnalysis.lmTrigram(graft.sources.Tables(spark, dir))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val lpABA = math.log(0.7 * 1 + 0.2 * (1.0 / 1) + 0.1 * (4.0 / 6))
    val lpBAB = math.log(0.7 * 1 + 0.2 * (2.0 / 3) + 0.1 * (2.0 / 6))
    assert(tg(1L) === ((r4((lpUniA + lpAB + lpABA + lpBAB) / 4), 4L)))
    // a 2-token doc never reaches the trigram leg: unigram + bigram only
    assert(tg(2L) === ((r4((lpUniA + lpAA) / 2), 2L)))
  }

  test("perplexity buckets: exact histogram thirds, ties share a bucket, head = most fluent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pplb").toString
    // 6 docs engineered into 3 distinct score levels: the repeated
    // high-probability bigram ranks docs by fluency deterministically
    Seq(
      (1L, "a a a a", "en", "s", 7L), (2L, "a a a a", "en", "s", 7L),
      (3L, "a a b b", "en", "s", 7L), (4L, "a a b b", "en", "s", 7L),
      (5L, "b c d e", "en", "s", 7L), (6L, "c e d b", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.pplBuckets(graft.sources.Tables(spark, dir))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byBucket = got.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    // identical texts score identically → ties land in the same bucket
    assert(byBucket("head") === Set(1L, 2L), s"head was ${byBucket.get("head")}")
    assert(byBucket("middle") === Set(3L, 4L))
    assert(byBucket("tail") === Set(5L, 6L))
    // head really is the highest (most fluent) score band
    val headMin = got.filter(_._3 == "head").map(_._2).min
    val tailMax = got.filter(_._3 == "tail").map(_._2).max
    assert(headMin > tailMax)

    // bucket-weighted sampling on the same fixture: head keeps
    // wholesale; middle/tail draws match the portable md5 rule exactly
    val sample = graft.operators.TextAnalysis.pplSample(graft.sources.Tables(spark, dir))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def kept(ids: Seq[Long], pct: Int): Long =
      ids.count(id => graft.functions.Hashing.md5LongLocal(s"pplmix:$id") % 100 < pct).toLong
    assert(sample("head") === ((2L, 2L)), "head keeps 100%")
    assert(sample("middle") === ((2L, kept(Seq(3L, 4L), 50))))
    assert(sample("tail") === ((2L, kept(Seq(5L, 6L), 10))))
  }

  test("pipeline funnel: a doc dropped at an earlier gate cannot claim dedup survivorship") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    // doc_ids 30 and 60 both hit the seeded dup cluster (doc_id % 30 == 0)
    // AND the URL keep arm (% 6 == 0); doc 30 carries text engineered to
    // FAIL the quality gate (no stopwords, thin), doc 60 text that passes.
    // Sequencing: 30 drops at quality, so 60 must survive dedup even
    // though 30 has the smaller id. Filler docs keep ids unique.
    val passText = ("the data table scans and the value is in it for on " * 12).trim
    val failText = "zz qq ww"
    val rows = Seq(
      (30L, failText, "en", "s", failText.length.toLong),
      (60L, passText, "en", "s", passText.length.toLong),
      (90L, passText + " unique tail", "en", "s", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.pipelineFunnel(graft.sources.Tables(spark, dir))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 30 lands in 2_drop_quality, NOT in 3_drop_duplicate
    assert(got("2_drop_quality")._1 === 1L && got("2_drop_quality")._2 === 30L)
    // docs 60 and 90 both pass url+quality; 90 drops as a duplicate of 60
    // ONLY IF they share the seeded hash — 90 % 30 == 0 too, so the
    // cluster is {30(dropped earlier), 60, 90} and 60 (min ELIGIBLE id)
    // survives while 90 drops as duplicate
    assert(got("3_drop_duplicate") === ((1L, 90L)),
      s"90 must drop as a dup of survivor 60, got $got")
    assert(!got.contains("1_drop_url"), "all three fixture ids pass the URL arm")
  }

  test("pipeline funnel near-dup gate (r16): only stage-4-reaching docs participate in LSH") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel6").toString
    val fluentA = ("the data table scans and the value is in it for on " * 12).trim
    val fluentB = ("a cat sat on the mat and it is of to for the win " * 12).trim
    // ids avoid % 30 == 0 / 6 (no funnel-seeded overrides); % 6 == 0 ids
    // take the URL keep arm, 20 takes the blocked-domain arm
    val rows = Seq(
      (12L, fluentA, "en", "s", 1L),                      // exact survivor, LSH anchor
      (42L, fluentA, "en", "s", 1L),                      // exact copy -> 3_drop_duplicate
      (72L, fluentA + " changed ending here", "en", "s", 1L), // near-dup of 12 -> 4_drop_neardup
      (20L, fluentB, "en", "s", 1L),                      // drops at 1_drop_url (20 % 6 = 2)
      (48L, fluentB + " other tail", "en", "s", 1L))      // near-dup ONLY of 20 -> must NOT drop at 4
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.pipelineFunnel(graft.sources.Tables(spark, dir))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("1_drop_url") === ((1L, 20L)))
    assert(got("3_drop_duplicate") === ((1L, 42L)),
      "the exact copy drops at the EXACT stage, never reaching LSH")
    assert(got("4_drop_neardup") === ((1L, 72L)),
      s"72 band-collides with survivor 12 and drops; 48's only near-dup (20) " +
        s"dropped at the URL gate and must not count — got $got")
    // 12 and 48 pass all gates; their fate is the deterministic draw
    // 12 and 48 reach the r17 ppl gate: with two scored docs the
    // higher scorer is head (always kept), the lower is middle (md5
    // draw at 50%), so each lands in one of the three tail stages —
    // the near-dup assertions above are what THIS spec pins; the
    // precise ppl/sample allocation is pinned by the board oracle
    // (all-en fixture: the r18 langid gate passes every doc here)
    val survivors = Seq("6_drop_ppl", "7_drop_sample", "8_kept")
      .flatMap(st => got.get(st).map(_._1).toList).sum
    assert(survivors === 2L, s"12 and 48 must reach the ppl gate, got $got")
  }

  test("pipeline funnel langid gate (r18): a doc the classifier assigns to another " +
    "language drops at stage 5 BEFORE paying for LM scoring") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel5").toString
    // two fluent en docs plus a doc of de-labeled gibberish whose
    // trigrams train ONLY the de weight vector — the classifier must
    // assign it de (real discrimination, the LangIdModelSpec shape)
    // and the funnel must stop it at 5_drop_langid, never scoring it
    val fluentA = ("the data table scans and the value is in it for on " * 12).trim
    val fluentB = ("a cat sat on the mat and it is of to for the win " * 12).trim
    val junk = ("zqx wvk pfg rrj mnb " * 25).trim
    // all ids on the URL keep arm (% 6 == 0), off the seeded-override
    // ids (% 30 != 0/6)
    val rows = Seq((12L, fluentA, "en"), (24L, fluentB, "en"), (42L, junk, "de"))
    rows.map { case (id, tx, l) => (id, tx, l, "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.pipelineFunnel(graft.sources.Tables(spark, dir))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.get("5_drop_langid") === Some((1L, 42L)),
      s"the de doc must drop at the langid gate, got $got")
    val after5 = Seq("6_drop_ppl", "7_drop_sample", "8_kept")
      .flatMap(st => got.get(st).map(_._1)).sum
    assert(after5 === 2L, s"both en docs must reach the ppl gate, got $got")
  }

  test("pipeline funnel ppl gate (r17, reworked r18): the lowest-scoring IN-STRATUM " +
    "survivor lands in the tail bucket and drops when its 10% draw misses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel7").toString
    // three stage-6 survivors, all on the URL keep arm (% 6 == 0), off
    // the seeded-override ids (% 30 != 0/6), and all PREDICTED en (the
    // r18 langid gate sits upstream, so an out-of-stratum doc would
    // drop there — the tail doc must now be low-scoring WITHIN the
    // stratum): two fluent repetitive docs (high bigram mass) and one
    // doc whose every "the X" continuation is unique (bigram count 1
    // against a large c(the) — the rare-continuation shape). Its id is
    // chosen so the md5 keep draw (10% in the tail) MISSES, making
    // 6_drop_ppl deterministic.
    val fluentA = ("the data table scans and the value is in it for on " * 12).trim
    val fluentB = ("a cat sat on the mat and it is of to for the win " * 12).trim
    val rare = (1 to 40).map(i => s"the w$i").mkString(" ")
    val rareId = Seq(12L, 18L, 24L, 42L, 48L, 54L, 72L).find(id =>
      graft.functions.Hashing.md5LongLocal(s"funnelppl:$id") % 100 >= 10).get
    val fluentIds = Seq(12L, 18L, 24L, 42L).filterNot(_ == rareId).take(2)
    val rows = Seq(
      (fluentIds(0), fluentA, "en"), (fluentIds(1), fluentB, "en"), (rareId, rare, "en"))
    rows.map { case (id, tx, l) => (id, tx, l, "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.pipelineFunnel(graft.sources.Tables(spark, dir))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!got.contains("1_drop_url") && !got.contains("2_drop_quality") &&
      !got.contains("3_drop_duplicate") && !got.contains("4_drop_neardup") &&
      !got.contains("5_drop_langid"),
      s"all three docs must reach the ppl gate, got $got")
    val (pplN, pplFirst) = got.getOrElse("6_drop_ppl", (0L, -1L))
    // the rare doc always drops (tail, draw chosen to miss); the MIDDLE
    // fluent doc may also drop on its 50% draw — so 1 or 2 ppl drops,
    // and when it's exactly one it must be the rare doc
    assert(pplN === 1L || pplN === 2L, s"expected 1-2 ppl drops, got $got")
    if (pplN == 1L) assert(pplFirst === rareId,
      s"the rare-continuation doc $rareId must be the ppl drop, got $got")
    val after6 = Seq("7_drop_sample", "8_kept").flatMap(st => got.get(st).map(_._1)).sum
    assert(after6 === 3L - pplN, s"stage accounting must close, got $got")
    assert(after6 >= 1L, s"the head-bucket survivor must pass the ppl gate, got $got")
  }

  test("reference-LM cross-scoring: Laplace OOV, zero bigram mass on unseen context, " +
    "in-reference docs outscore foreign ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lmref").toString
    Seq((1L, "a b a", "en", "s", 5L), (2L, "a c", "zh", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.lmRef(graft.sources.Tables(spark, dir))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // reference = doc 1 only: N=3, V=2 (a:2, b:1); P_uni = (c+1)/(N+V+1)=(c+1)/6
    // doc 2 "a c": pos0 ln(3/6); bigram (a,c): context 'a' seen (c_p=1) but
    // pair unseen -> 0.9*0/1 + 0.1*(1/6)
    val want2 = r4((math.log(3.0 / 6) + math.log(0.1 * (1.0 / 6))) / 2)
    assert(got(2L) === (("zh", want2, 2L)))
    // doc 1 (in-reference): pos0 ln(3/6); (a,b) 0.9*1/1+0.1*(2/6); (b,a) 0.9*1/1+0.1*(3/6)
    val want1 = r4((math.log(3.0 / 6) + math.log(0.9 + 0.1 * (2.0 / 6)) +
      math.log(0.9 + 0.1 * (3.0 / 6))) / 3)
    assert(got(1L) === (("en", want1, 3L)))
    assert(got(1L)._2 > got(2L)._2, "the reference-language doc must outscore the foreign one")
  }
}
