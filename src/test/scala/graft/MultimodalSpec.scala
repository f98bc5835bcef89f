package graft

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-vacuous evidence for the multimodal near-dup/contamination
  * operators: seeded positive pairs with KNOWN Hamming distances through
  * the exact board code path ([[Multimodal.dhashNearDupOver]]), a
  * negative at distance ≥ 4, the df cap binding on the caption leg, and
  * the pack-bucket config being honored. */
class MultimodalSpec extends SparkSpec {

  /** Test-side reference dHash — the same 9×8 sampling rule as the
    * operator's column expression (1-indexed substr pos `1 + (i·len div
    * 72)` = 0-based index `(i·len) / 72`). */
  private def refDhash(s: String): Long =
    (0 until 63).map { k =>
      val (r, c) = (k / 8, k % 8)
      def px(i: Int): Int = s.charAt(i * s.length / 72).toInt
      if (px(r * 9 + c + 1) > px(r * 9 + c)) 1L << k else 0L
    }.sum

  private def refHamming(a: String, b: String): Int =
    java.lang.Long.bitCount(refDhash(a) ^ refDhash(b))

  /** Length-144 base: every even index is sampled (sample j reads index
    * 2j), odd indices never are — perturbing index 2j alters exactly
    * sample j, which feeds at most two gradient bits. */
  private val base = "ab" * 72

  private def perturb(s: String, idx: Int*): String = {
    val arr = s.toCharArray
    idx.foreach(i => arr(i) = 'z')
    new String(arr)
  }

  private def pairsOf(a: String, b: String): Array[(Long, Long, Long)] = {
    import spark.implicits._
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    Multimodal.dhashNearDupOver(docs)
      .as[(Long, Long, Long)].collect()
  }

  test("a 1-bit perturbed twin surfaces with the exact Hamming distance") {
    val twin = perturb(base, 2)
    assert(refHamming(base, twin) === 1, "construction check")
    assert(pairsOf(base, twin).toSeq === Seq((1L, 2L, 1L)))
  }

  test("a 3-bit twin (threshold boundary) surfaces with distance 3") {
    val twin = perturb(base, 2, 20, 40)
    assert(refHamming(base, twin) === 3, "construction check")
    assert(pairsOf(base, twin).toSeq === Seq((1L, 2L, 3L)))
  }

  test("a 4-bit twin is a candidate (two bands still match) but the exact verify drops it") {
    val twin = perturb(base, 2, 20, 40, 60)
    assert(refHamming(base, twin) === 4, "construction check")
    assert(pairsOf(base, twin).isEmpty)
  }

  test("a twin differing in all four bands generates no candidate at all") {
    // bits 0, 17, 32, 48 — one per 16-bit band
    val twin = perturb(base, 2, 40, 74, 110)
    assert(refHamming(base, twin) === 4, "construction check")
    val d = refDhash(base) ^ refDhash(twin)
    assert((0 until 4).forall(b => ((d >>> (b * 16)) & 0xffffL) != 0L),
      "construction check: every band must differ")
    assert(pairsOf(base, twin).isEmpty)
  }

  test("board query: every seeded fixture twin surfaces as a Hamming<=1 pair") {
    import spark.implicits._
    val t = Tables(spark, sf0001)
    val expected = t.documents
      .filter(col("doc_id") % 100 === 0 && length(col("text")) >= 72 &&
        expr("ascii(substr(text, 1 + (length(text) div 72), 1))") >= 2 &&
        expr("ascii(substr(text, 1 + (length(text) div 72), 1))") <= 126)
      .select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty, "fixture must contain seedable docs")
    val off = t.documents.agg(max("doc_id")).as[Long].head() + 1
    val got = Multimodal.dhashNearDupSeeded(t)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    expected.foreach { id =>
      val h = got.get((id, id + off))
      // EXACTLY 1 (r13): the first-char substitution provably flips
      // gradient bit 0, so twins exercise the NEAR-dup tolerance of the
      // band join + verify, never the exact-dup (Hamming 0) fast case
      assert(h.contains(1L), s"seeded twin of $id must be a Hamming-1 pair: $h")
    }
    // the PRODUCTION operator stays clean: no fabricated pairs
    assert(Multimodal.dhashNearDup(t).count() === 0,
      "the fixture has no natural near-dups; the unseeded operator must emit none")
  }

  // ---- caption df cap ------------------------------------------------------

  private def pairDocs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("caption leg: a shingle above the df cap is not contamination evidence") {
    // "w0 w1 w2 w3 w4" is shared by the benchmark row and 6 corpus rows
    // (df = 7 > cap 5); the discriminative "q0 q1 q2 q3 q4" is shared
    // with exactly one corpus row (df = 2 <= 5)
    val boiler = "w0 w1 w2 w3 w4"
    val docs = pairDocs(
      Seq((100L, "src0", s"$boiler q0 q1 q2 q3 q4")) ++
        (1L to 6L).map(i => (i, "srcX", s"$boiler tail$i")) ++
        Seq((7L, "srcX", "q0 q1 q2 q3 q4 other words here")))
    val hits = Multimodal.pairContaminationCapped(docs, cap = 5)
      .filter(col("match_kind") === "caption")
      .select("doc_id", "bench_id")
    import spark.implicits._
    assert(hits.as[(Long, Long)].collect().toSet === Set((7L, 100L)),
      "only the discriminative shingle may match; the boilerplate one is df-capped")
  }

  test("caption leg without the cap would have matched the boilerplate (cap binds)") {
    val boiler = "w0 w1 w2 w3 w4"
    val docs = pairDocs(
      Seq((100L, "src0", s"$boiler q0 q1 q2 q3 q4")) ++
        (1L to 6L).map(i => (i, "srcX", s"$boiler tail$i")))
    val uncapped = Multimodal.pairContaminationCapped(docs, cap = 1000)
      .filter(col("match_kind") === "caption").count()
    val capped = Multimodal.pairContaminationCapped(docs, cap = 5)
      .filter(col("match_kind") === "caption").count()
    assert(uncapped === 6L && capped === 0L)
  }

  // ---- pack bucket config --------------------------------------------------

  test("mm_modality_tokens honors spark.graft.mm.packBuckets") {
    val t = Tables(spark, sf0001)
    val at4 = Multimodal.modalityTokens(t).select("doc_id", "pack_id", "pack_offset").collect().toSet
    try {
      spark.conf.set(Multimodal.MmPackBucketsConf, "1")
      val at1 = Multimodal.modalityTokens(t).select("doc_id", "pack_id", "pack_offset").collect().toSet
      assert(at1 !== at4, "a different bucket fan-out must change pack assignment")
      // one bucket = one window per (source, lang): pack ids contiguous from 0
      spark.conf.set(Multimodal.MmPackBucketsConf, "0")
      intercept[IllegalArgumentException](Multimodal.modalityTokens(t).collect())
    } finally spark.conf.unset(Multimodal.MmPackBucketsConf)
  }
}
