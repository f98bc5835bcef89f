package graft

import graft.functions.TextOps
import graft.operators.NgramLm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pruned + stupid-backoff LM (r16): hand-computed math, pruning
  * demonstrably binding, artifact round trip, and loud tamper refusal. */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  // ref (en): d1 "a b a b", d2 "a b c"
  //   unigrams a:3 b:3 c:1 -> n_ref=7, v_ref=3
  //   bigrams (a,b):3 (b,a):1 (b,c):1; contexts a:3 b:2
  //   pruned at k=2: kept = {(a,b):3} — (b,a) and (b,c) DROP
  private def fixture: DataFrame =
    Seq((1L, "a b a b", "en"), (2L, "a b c", "en"),
        (3L, "a b a", "de"), (4L, "z z", "fr"))
      .toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))

  private def trained = NgramLm.train(
    fixture.filter(col("lang") === "en").select("doc_id", "toks"))

  private val denom = 11.0 // n_ref + v_ref + 1
  private def r4(x: Double) = math.round(x * 1e4) / 1e4

  test("training prunes below-k bigrams but keeps TRUE context totals") {
    val m = trained
    assert(m.nRef === 7L && m.vRef === 3L && m.k === 2)
    val kept = m.bigrams.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(kept === Map(("a", "b") -> 3L), "pruning must bite: only (a,b) clears k=2")
    val ctx = m.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx === Map("a" -> 3L),
      "context VALUES stay unpruned (the kept event's denominator is the true " +
        "count) but only kept prevs persist — 'b' has no kept bigram, so no context row")
  }

  test("stupid-backoff scoring matches the hand computation (kept, pruned, OOV)") {
    val m = trained
    val got = NgramLm.score(fixture.select("doc_id", "toks"), m)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // d3 "a b a": ln(4/11) + ln(3/3) [kept] + ln(0.4*4/11) [pruned (b,a) backs off]
    val d3 = (math.log(4 / denom) + 0.0 + math.log(0.4 * 4 / denom)) / 3
    assert(got(3L) === ((r4(d3), 1L, 3L)))
    // d4 "z z": OOV unigram ln(1/11) + unseen bigram ln(0.4*1/11)
    val d4 = (math.log(1 / denom) + math.log(0.4 * 1 / denom)) / 2
    assert(got(4L) === ((r4(d4), 1L, 2L)))
    // d1 "a b a b": ln(4/11) + kept(a,b)=ln(1) + pruned(b,a) + kept(a,b)
    val d1 = (math.log(4 / denom) + 0.0 + math.log(0.4 * 4 / denom) + 0.0) / 4
    assert(got(1L) === ((r4(d1), 1L, 4L)))
  }

  test("artifact round trip: the loaded model scores identically to the trained one") {
    val root = Files.createTempDirectory("lmart").toString + "/m"
    val m = trained
    NgramLm.save(spark, m, root)
    val loaded = NgramLm.load(spark, root)
    assert(loaded.nRef === m.nRef && loaded.vRef === m.vRef &&
      loaded.k === m.k && loaded.alpha === m.alpha)
    val a = NgramLm.score(fixture.select("doc_id", "toks"), m).orderBy("doc_id").collect()
    val b = NgramLm.score(fixture.select("doc_id", "toks"), loaded).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("tampered artifacts refuse loud (below-k bigram / orphan context / unigram drift)") {
    val m = trained
    // below the prune threshold
    val r1 = Files.createTempDirectory("lmt1").toString + "/m"
    NgramLm.save(spark, m, r1)
    Seq(("x", "y", 1L)).toDF("prev", "w", "c_pw")
      .write.mode("overwrite").parquet(s"$r1/bigrams")
    val e1 = intercept[IllegalArgumentException](NgramLm.load(spark, r1))
    assert(e1.getMessage.contains("prune threshold"))
    // kept bigram whose context is missing
    val r2 = Files.createTempDirectory("lmt2").toString + "/m"
    NgramLm.save(spark, m, r2)
    Seq(("x", "y", 5L)).toDF("prev", "w", "c_pw")
      .write.mode("overwrite").parquet(s"$r2/bigrams")
    val e2 = intercept[IllegalArgumentException](NgramLm.load(spark, r2))
    assert(e2.getMessage.contains("missing or undersized context"))
    // unigram relation no longer reproduces the consts
    val r3 = Files.createTempDirectory("lmt3").toString + "/m"
    NgramLm.save(spark, m, r3)
    m.unigrams.filter(col("term") =!= "c")
      .write.mode("overwrite").parquet(s"$r3/unigrams")
    val e3 = intercept[IllegalArgumentException](NgramLm.load(spark, r3))
    assert(e3.getMessage.contains("does not reproduce the consts"))
  }

  test("trigram rung: kept/bigram-backoff/double-backoff legs match the hand computation; " +
    "contexts are pruned-bounded") {
    // ref: e1 "a b a b a", e2 "a b c" -> unigrams a:4 b:3 c:1 (n=8, v=3,
    // denom 12); kept bigrams (a,b):3 (b,a):2; trigrams (a,b,a):2
    // (b,a,b):1 (a,b,c):1 -> kept3 only (a,b,a):2, tcontext (a,b):3
    val fix = Seq((1L, "a b a b a", "en"), (2L, "a b c", "en"),
        (3L, "a b a b", "de"), (4L, "c c", "fr"), (5L, "a b x", "zh"))
      .toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
    val m = NgramLm.train3(fix.filter(col("lang") === "en").select("doc_id", "toks"))
    assert(m.trigrams.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap ===
      Map(("a", "b", "a") -> 2L), "only (a,b,a) clears k=2")
    assert(m.tcontexts.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap === Map(("a", "b") -> 3L),
      "tcontexts keep UNPRUNED totals but only for kept trigrams' contexts")
    val d12 = 12.0
    val got = NgramLm.score3(fix.select("doc_id", "toks"), m).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // "a b a b": uni a + kept(a,b) + kept3(a,b,a) + [b,a,b -> alpha*kept(a,b)]
    val d3 = (math.log(5 / d12) + 0.0 + math.log(2.0 / 3) + math.log(0.4)) / 4
    assert(got(3L) === ((r4(d3), 1L, 4L)))
    // "c c": OOV-ish unigram + unseen bigram -> alpha * P_uni(c)
    val d4 = (math.log(2 / d12) + math.log(0.4 * 2 / d12)) / 2
    assert(got(4L) === ((r4(d4), 1L, 2L)))
    // "a b x": pos2 trigram miss AND bigram (b,x) miss -> alpha^2 * P_uni(x)
    val d5 = (math.log(5 / d12) + 0.0 + math.log(0.4 * 0.4 * 1 / d12)) / 3
    assert(got(5L) === ((r4(d5), 1L, 3L)))
  }

  test("trigram artifact: round trip scores identically; tampered trigram context refuses") {
    val fix = Seq((1L, "a b a b a", "en"), (2L, "a b c", "en"))
      .toDF("doc_id", "text", "lang")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val m = NgramLm.train3(fix)
    val root = Files.createTempDirectory("lm3art").toString + "/m"
    NgramLm.save3(spark, m, root)
    val loaded = NgramLm.load3(spark, root)
    val a = NgramLm.score3(fix, m).orderBy("doc_id").collect()
    val b = NgramLm.score3(fix, loaded).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    // a kept trigram whose context is missing refuses loud
    val r2 = Files.createTempDirectory("lm3t").toString + "/m"
    NgramLm.save3(spark, m, r2)
    Seq(("x", "y", "z", 5L)).toDF("p2", "p1", "w", "c_t")
      .write.mode("overwrite").parquet(s"$r2/trigrams")
    val e = intercept[IllegalArgumentException](NgramLm.load3(spark, r2))
    assert(e.getMessage.contains("missing or undersized context"))
  }

  test("ppl_ref_sample: thirds split on the pruned-model scores, keep draws match " +
    "the portable md5 rule") {
    val dir = Files.createTempDirectory("pplref").toString
    // six docs with distinct fluency: 2 in-reference-ish, 2 middling,
    // 2 OOV-heavy — enough distinct scores for clean thirds
    Seq((1L, "a b a b", "en"), (2L, "a b a", "en"),
        (3L, "a b c", "de"), (4L, "b a b", "fr"),
        (5L, "x y z", "zh"), (6L, "z z z z", "zh"))
      .map { case (id, tx, l) => (id, tx, l, "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val t = graft.sources.Tables(spark, dir)
    val got = NgramLm.pplRefSample(t).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === Set("head", "middle", "tail"))
    assert(got.values.map(_._1).sum === 6L, "every doc lands in exactly one bucket")
    assert(got("head")._1 === 2L && got("middle")._1 === 2L && got("tail")._1 === 2L,
      s"six distinct scores split into exact thirds, got $got")
    // the keep draw is the deterministic md5 rule, recomputable locally
    val scores = NgramLm.score(
      t.documents.select(col("doc_id"), TextOps.tokens(col("text")).as("toks")),
      NgramLm.train(t.documents.filter(col("lang") === "en")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))))
      .orderBy(col("avg_logprob_pb").desc).collect().map(_.getLong(0))
    def kept(ids: Seq[Long], pct: Int): Long =
      ids.count(id => graft.functions.Hashing.md5LongLocal(s"pplref:$id") % 100 < pct).toLong
    assert(got("head")._2 === kept(scores.take(2).toSeq, 100))
    assert(got("middle")._2 === kept(scores.slice(2, 4).toSeq, 50))
    assert(got("tail")._2 === kept(scores.drop(4).toSeq, 10))
  }

  test("empty / whitespace-only docs emit NO score row (no phantom OOV event)") {
    // r16 review finding: '' tokenizes to [''] and the position-0 leg
    // scored it as one Laplace OOV event (n_scored=1 for an empty doc);
    // the guard drops such docs from the output entirely — both rungs
    val m = trained
    val docs = Seq((1L, "a b"), (5L, ""), (6L, "   \t "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val ids = NgramLm.score(docs, m).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L), s"score(): expected only doc 1, got $ids")
    val m3 = NgramLm.train3(fixture.filter(col("lang") === "en").select("doc_id", "toks"))
    val ids3 = NgramLm.score3(docs, m3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids3 === Set(1L), s"score3(): expected only doc 1, got $ids3")
  }

  test("ppl keys: the EXECUTED plan reuses the scoring subtree " +
    "(ReusedExchange), so the corpus pays one scoring pass") {
    // the static plans reference the score relation three times (count,
    // histogram, assignment — text_ppl_ref_sample is the board's widest
    // static plan: 22 exchanges + 2 one-row bounds BNLJs); the r15
    // text_ppl_buckets adjudication showed runtime ReusedExchange
    // collapses this and a persist() measured 1.4x slower — this pins
    // the claim for BOTH keys (r16 verdict #7) instead of prose
    Seq("text_ppl_ref_sample", "text_ppl_buckets").foreach { key =>
      val df = SparkEntry.queries(key)(spark, sf0001)
      assert(df.collect().nonEmpty)
      val executed = df.queryExecution.executedPlan.toString
      val reused = "ReusedExchange".r.findAllIn(executed).size
      assert(reused >= 1,
        s"$key: expected runtime exchange reuse in the executed plan, found none:\n$executed")
    }
  }

  test("the board query runs end to end on testdata and backs off somewhere") {
    val t = graft.sources.Tables(spark, sf0001)
    val rows = NgramLm.lmPruned(t).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.isNullAt(1)), "every doc gets a finite score")
  }
}
