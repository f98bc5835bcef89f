package graft

import graft.functions.TextOps
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** fastText-shaped language ID (r16): real-language discrimination on a
  * hand fixture (testdata's labels are random, so the board key cannot
  * prove it), artifact-loader fidelity, loud tamper refusal. */
class LangIdModelSpec extends SparkSpec {

  import spark.implicits._

  // two genuinely-different-language snippets per label; pinyin stands in
  // for zh (the fixture corpus is ASCII)
  private val snippets = Seq(
    (1L, "the cat is on the table and it is happy to see the dog in the house today", "en"),
    (2L, "this is the way the world works and the people are talking about the weather", "en"),
    (3L, "el gato esta sobre la mesa y le gusta ver al perro en la casa de madera", "es"),
    (4L, "los ninos juegan en el parque mientras sus padres hablan de la comida y el tiempo", "es"),
    (5L, "die katze ist auf dem tisch und sie freut sich den hund im haus zu sehen", "de"),
    (6L, "die kinder spielen im garten waehrend die eltern ueber das wetter sprechen", "de"),
    (7L, "le chat est sur la table et il aime voir le chien dans la maison en bois", "fr"),
    (8L, "les enfants jouent dans le jardin pendant que les parents parlent du temps", "fr"),
    (9L, "mao zai zhuo zi shang ta xi huan kan gou zai fang zi li mian de yang zi hen hao", "zh"),
    (10L, "wo men zai gong yuan wan shua hai zi men shuo hua tian qi hen hao jin tian", "zh"))

  private def fixtureDir(): String = {
    val dir = Files.createTempDirectory("lidfix").toString
    snippets.map { case (id, tx, l) => (id, tx, l, "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("trained char-trigram classifier discriminates real languages (resubstitution)") {
    val got = TextAnalysis.langIdModel(graft.sources.Tables(spark, fixtureDir()))
      .select("doc_id", "lang", "pred_lang").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
    assert(got.nonEmpty)
    got.foreach { case (id, (lang, pred)) =>
      assert(pred === lang, s"doc $id labeled $lang predicted $pred")
    }
  }

  test("docs too short for a trigram read 'und'") {
    val dir = Files.createTempDirectory("lidshort").toString
    (snippets :+ ((11L, "ab", "en"))).map { case (id, tx, l) => (id, tx, l, "s", 2L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.langIdModel(graft.sources.Tables(spark, dir))
      .filter(col("doc_id") === 11L).select("pred_lang").head().getString(0)
    assert(got === "und")
  }

  test("the codepoint-mix bucket hash SPREADS: 676 two-letter words cover nearly " +
    "all 256 buckets (r17, guards the mix constants)") {
    // one doc holding every aa..zz word gives thousands of distinct
    // char-trigrams (letter and space-adjacent); a healthy 256-bucket
    // hash covers essentially all buckets (coupon collector at >5000
    // draws), while a broken constant (e.g. an even multiplier
    // stranding low bits) collapses coverage. Observed buckets are the
    // trained weights ABOVE the empty-bucket floor weight.
    val text = (for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$a$b").mkString(" ")
    val trained = TextAnalysis.lidTrain(Seq((1L, text, "en")).toDF("doc_id", "text", "lang"))
      .filter(col("lang") === "en").select("bucket", "w_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(trained.length === 256)
    val floor = trained.map(_._2).min
    val used = trained.count(_._2 > floor)
    assert(used >= 250, s"mix covered only $used of 256 buckets — constants degraded")
  }

  test("the artifact loader reproduces the trained weights exactly") {
    val docs = snippets.map { case (id, tx, l) => (id, tx, l) }.toDF("doc_id", "text", "lang")
    val trained = TextAnalysis.lidTrain(docs)
    val direct: Map[(String, Long), Long] = trained.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val root = Files.createTempDirectory("lidart").toString
    trained.coalesce(1).write.parquet(s"$root/weights")
    val loaded = TextOps.langModelWeights(spark, s"$root/weights",
      Seq("en", "es", "de", "fr", "zh"), 256)
    for (l <- loaded.keys; b <- 0 until 256)
      assert(loaded(l)(b) === direct((l, b.toLong)),
        s"loader drifted from trainer at ($l, $b)")
  }

  test("tampered lang-model artifacts refuse loud (missing row / missing lang)") {
    val docs = snippets.map { case (id, tx, l) => (id, tx, l) }.toDF("doc_id", "text", "lang")
    val trained = TextAnalysis.lidTrain(docs)
    val r1 = Files.createTempDirectory("lidt1").toString
    trained.filter(!(col("lang") === "fr" && col("bucket") === 7L))
      .coalesce(1).write.parquet(s"$r1/weights")
    val e1 = intercept[IllegalArgumentException](TextOps.langModelWeights(
      spark, s"$r1/weights", Seq("en", "es", "de", "fr", "zh"), 256))
    assert(e1.getMessage.contains("rows for"))
    val r2 = Files.createTempDirectory("lidt2").toString
    trained.filter(col("lang") =!= "zh")
      .withColumn("lang", when(col("lang") === "en", lit("xx")).otherwise(col("lang")))
      .coalesce(1).write.parquet(s"$r2/weights")
    val e2 = intercept[IllegalArgumentException](TextOps.langModelWeights(
      spark, s"$r2/weights", Seq("en", "es", "de", "fr", "zh"), 256))
    assert(e2.getMessage.contains("covers langs") || e2.getMessage.contains("rows for"))
  }

  test("codepoint derivation is per-CODEPOINT beyond the BMP (r18, review r17): astral " +
    "and combining-mark input matches DuckDB's string_split/ascii numbers exactly") {
    // the engine-parity contract the integer mix rests on: Spark
    // split(t,'') + ascii(c) must yield the SAME per-codepoint list as
    // DuckDB string_split(t,'') + ascii(c). r17 verified U+20AC (BMP);
    // these are the two shapes where per-character splitting semantics
    // can diverge — a supplementary-plane codepoint (U+1D11E, a
    // surrogate PAIR in the JVM) and a combining sequence (e + U+0301,
    // two codepoints, one grapheme). Expected values measured from
    // DuckDB: ascii(U+1D11E) = 119070, ascii(U+0301) = 769,
    // and BOTH engines split per codepoint (never per UTF-16 unit,
    // never per grapheme).
    val rows = Seq("a\uD834\uDD1Eb", "e\u0301x").toDF("t")
      .select(col("t"), TextAnalysis.lidCps.as("cps"))
      .orderBy("t").collect()
    assert(rows(0).getSeq[Long](1) === Seq(97L, 119070L, 98L),
      "astral codepoint must arrive whole (a surrogate-half split would read 55348/56606)")
    assert(rows(1).getSeq[Long](1) === Seq(101L, 769L, 120L),
      "combining mark must be its own codepoint (grapheme clustering would merge it)")
    // and the bucket mix stays lawful on max-plane input: codepoints up
    // to U+10FFFF keep h < 2^62 (no overflow) and buckets in [0, 256)
    val buckets = Seq("\uDBFF\uDFFF\uDBFF\uDFFF\uDBFF\uDFFF").toDF("t")
      .withColumn("cps", TextAnalysis.lidCps)
      .select(TextAnalysis.lidBucketArr.as("b")).head().getSeq[Int](0)
    assert(buckets.length === 1 && buckets.forall(b => b >= 0 && b < 256))
  }
}
