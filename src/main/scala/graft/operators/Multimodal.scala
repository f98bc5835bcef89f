package graft.operators

import graft.QueryDef
import graft.functions.Hashing
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, plus batched feature extraction.
  *
  * The real decode step (image/audio libs) is STUBBED — this environment
  * has no codecs — as a deterministic fake keyed off the payload bytes.
  * What is real, and what matters at 100 TB, is the Spark-side plumbing:
  * binary columns flowing through parquet, metadata derived with native
  * expressions, and per-partition *batched* processing (`mapPartitions`
  * over grouped iterators — the Scala analog of `mapInPandas` batches)
  * so a vectorized decoder amortizes model/codec setup per batch instead
  * of per row, without materializing a partition in memory.
  */
object Multimodal {

  /** Synthesize the binary payload column (documents.text as UTF-8 bytes —
    * stand-in for image/audio blobs). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Metadata extraction over the binary column: size, checksum, and
    * decoded media dimensions (the decode being the deterministic stub). */
  def metadata(t: Tables): DataFrame = {
    val d = withPayload(t.documents)
    val checksum = md5(col("payload"))
    d.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("byte_len"),
      checksum.as("checksum"),
      (Hashing.md5Long(concat(lit("w:"), checksum)) % 640 + 1).as("width"),
      (Hashing.md5Long(concat(lit("h:"), checksum)) % 480 + 1).as("height"),
      (Hashing.md5Long(concat(lit("f:"), checksum)) % 30 + 1).as("n_frames")
    ).orderBy("doc_id")
  }

  // DuckDB's md5() takes VARCHAR only; md5 of the UTF-8 text equals md5 of
  // the UTF-8-encoded payload bytes, so the mirror hashes the text directly.
  private val metadataSql =
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS byte_len,
       |  md5(text) AS checksum,
       |  ${Hashing.sqlMd5Long("concat('w:', md5(text))")} % 640 + 1 AS width,
       |  ${Hashing.sqlMd5Long("concat('h:', md5(text))")} % 480 + 1 AS height,
       |  ${Hashing.sqlMd5Long("concat('f:', md5(text))")} % 30 + 1 AS n_frames
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Stub "decoder": a fixed-width feature vector from payload bytes.
    * Replace with a real codec + model in production — the signature
    * (bytes in, float features out, batched) is the contract. */
  private[graft] def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val n = payload.length.max(1)
    val mean = payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toFloat / n
    Array(
      n.toFloat,
      mean,
      (payload.headOption.getOrElse(0: Byte) & 0xff).toFloat,
      (payload.lastOption.getOrElse(0: Byte) & 0xff).toFloat
    )
  }

  private val featuresSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  /** Batched feature extraction: partitions stream through in batches of
    * 64 rows (decoder setup amortized per batch, bounded memory). */
  def features(t: Tables): DataFrame = {
    val d = withPayload(t.documents).select(col("doc_id"), col("payload"))
    val spark = t.spark
    val encoder = org.apache.spark.sql.Encoders.row(featuresSchema)
    d.mapPartitions { rows =>
      rows.grouped(64).flatMap { batch =>
        // per-batch decoder init would go here (model load, codec ctx)
        batch.map { r =>
          Row(r.getLong(0), fakeDecode(r.getAs[Array[Byte]](1)).toSeq)
        }
      }
    }(encoder).orderBy("doc_id")
  }

  /** Comparator-safe projection of [[features]]: the feature vector
    * flattened to f0..f3 scalar doubles. The driver's rows-only check
    * pandas-sorts every output column and cannot sort an `array<float>`
    * cell, so the registered query emits scalars; the batched
    * bytes-in/vector-out contract stays in [[features]]. */
  def featuresFlat(t: Tables): DataFrame =
    features(t).select(
      col("doc_id") +: (0 until 4).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i")): _*)

  // SQL mirror of [[fakeDecode]] over the UTF-8 payload. Requires an
  // ASCII corpus so per-char code points ARE the payload bytes — and
  // ENFORCES it: a non-ASCII row makes the oracle raise via error()
  // instead of silently diverging (also asserted in OperatorSmokeSpec).
  // FLOAT casts keep the mean in float32 arithmetic bit-for-bit with the
  // JVM's `sum.toFloat / n` (verified exact on all 500 sf0.01 docs).
  private val featuresSql =
    """SELECT doc_id,
      |  CAST(CAST(greatest(CASE WHEN octet_length(encode(text)) <> length(text)
      |                          THEN error('non-ASCII doc: mm_features oracle assumes byte==char')
      |                          ELSE length(text) END, 1) AS FLOAT) AS DOUBLE) AS f0,
      |  CASE WHEN length(text)=0 THEN 0.0
      |       ELSE CAST(CAST(CAST(list_aggregate(list_transform(split(text,''), c -> unicode(c)), 'sum') AS FLOAT)
      |                 / CAST(length(text) AS FLOAT) AS FLOAT) AS DOUBLE) END AS f1,
      |  CASE WHEN length(text)=0 THEN 0.0
      |       ELSE CAST(CAST(unicode(substr(text,1,1)) AS FLOAT) AS DOUBLE) END AS f2,
      |  CASE WHEN length(text)=0 THEN 0.0
      |       ELSE CAST(CAST(unicode(substr(text,length(text),1)) AS FLOAT) AS DOUBLE) END AS f3
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Resize planning: fit each decoded image into a 224-box preserving
    * aspect ratio — pure integer arithmetic on the metadata (the actual
    * pixel resample belongs in the stubbed decoder); no shuffle. */
  def resizePlan(t: Tables): DataFrame =
    metadata(t)
      .select(
        col("doc_id"), col("width"), col("height"),
        greatest(lit(1L), expr("(width * 224) div greatest(width, height)")).as("out_w"),
        greatest(lit(1L), expr("(height * 224) div greatest(width, height)")).as("out_h"))
      .orderBy("doc_id")

  private val resizePlanSql =
    s"""SELECT doc_id, width, height,
       |  greatest(1, (width * 224) // greatest(width, height)) AS out_w,
       |  greatest(1, (height * 224) // greatest(width, height)) AS out_h
       |FROM (
       |  SELECT doc_id,
       |    ${Hashing.sqlMd5Long("concat('w:', md5(text))")} % 640 + 1 AS width,
       |    ${Hashing.sqlMd5Long("concat('h:', md5(text))")} % 480 + 1 AS height
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Frame sampling: every 5th frame index per clip — the row-explosion
    * shape of video pipelines (rows multiply by frames/stride, so the
    * shuffle budget is decided here, before any decode). */
  def frameSample(t: Tables): DataFrame =
    metadata(t)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(5L))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  private val frameSampleSql =
    s"""SELECT doc_id, unnest(range(0, n_frames, 5)) AS frame_idx
       |FROM (
       |  SELECT doc_id, ${Hashing.sqlMd5Long("concat('f:', md5(text))")} % 30 + 1 AS n_frames
       |  FROM documents)
       |ORDER BY doc_id, frame_idx""".stripMargin

  // ---- perceptual-hash near-duplicates -----------------------------------

  /** Max Hamming distance for a dHash near-dup pair. Bands must
    * outnumber it for the pigeonhole guarantee (4 × 16-bit bands). */
  private val DhashMaxHamming = 3
  private val DhashBands = 4

  /** The 63-bit dHash of a payload's decoded thumbnail (bit 63 is
    * dropped so the hash — and DuckDB's power(2,k) mirror — stays in
    * signed-int64 range), as a native
    * column expression. The DECODE is the stub: a 9×8 "grayscale" grid
    * sampled from the payload bytes at evenly-spaced offsets (ASCII
    * corpus ⇒ char codes ARE the bytes — the same contract
    * [[featuresSql]] enforces). The HASH is the real dHash rule:
    * bit (r,c) set iff pixel(r,c+1) > pixel(r,c) — gradient signs, the
    * property that survives re-encoding/resizing in real images and
    * survives sampling here. Needs `length(text) >= 72` so every
    * sampled position is distinct-ish and in range. */
  private def dhashCol: Column =
    (0 until 63).map { k =>
      val (r, c) = (k / 8, k % 8)
      def px(i: Int): String = s"ascii(substr(text, 1 + (($i * length(text)) div 72), 1))"
      when(expr(px(r * 9 + c + 1)) > expr(px(r * 9 + c)), lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def sqlDhash: String = {
    val terms = (0 until 63).map { k =>
      val (r, c) = (k / 8, k % 8)
      def px(i: Int): String = s"unicode(substr(text, 1 + (($i * length(text)) // 72), 1))"
      s"CASE WHEN ${px(r * 9 + c + 1)} > ${px(r * 9 + c)} THEN CAST(power(2, $k) AS BIGINT) ELSE 0 END"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Perceptual-hash near-dup pairs (the image analog of
    * [[Dedup.simhash]]): dHash each payload, pigeonhole-block on
    * [[DhashBands]] 16-bit bands — Hamming ≤ [[DhashMaxHamming]] < bands
    * guarantees at least one band matches exactly, so candidates come
    * from equality joins on (band, value), never all-pairs — then
    * verify exact Hamming. At 100 TB: one hash pass, one explode ×4,
    * one hash-partitioned self-join whose volume tracks true bucket
    * sizes (heavy exact-dup buckets are real dup mass, same caveat as
    * every LSH family member). */
  def dhashNearDup(t: Tables): DataFrame = dhashNearDupOver(t.documents)

  /** The BOARD/ORACLE variant of [[dhashNearDup]]: runs over the corpus
    * PLUS seeded near-dup twins — the fixture-harness face, NOT the
    * production operator (a real corpus must never receive fabricated
    * pairs; [[dhashNearDup]] stays clean). It exists because the
    * synthetic fixture holds no natural near-dups, so the bare oracle
    * matched on 0 = 0 rows — evidence of nothing. Registered as
    * `mm_dhash_neardup` with the seeding mirrored in the oracle SQL. */
  private[graft] def dhashNearDupSeeded(t: Tables): DataFrame =
    dhashNearDupOver(withSeededTwins(t.documents))

  /** Every [[SeedEvery]]-th document re-emitted as a NEAR-DUP TWIN
    * (doc_id offset past the corpus maximum — collision-free on any
    * input — FIRST character substituted to flip gradient bit 0). The
    * twins are Hamming-EXACTLY-1 evidence BY CONSTRUCTION: the sampler
    * reads positions `1 + (i·len div 72)` for i = 0..70 only, each a
    * DISTINCT text position when len ≥ 72, and position 1 (i = 0)
    * feeds exactly one comparison — bit 0's `px(1) > px(0)`. The
    * substitution sets the first character RELATIVE to the i = 1
    * sample's character: one code point above it when the gradient was
    * positive (clearing bit 0), one below when it wasn't (setting it) —
    * so the bit provably FLIPS and every twin must survive band
    * extraction, the band join, and the exact Hamming verify as a
    * NEAR-dup (never an exact dhash dup) in BOTH engines to
    * hash-match. (The r12 shape substituted the LAST character, which
    * the sampler never reads — its max index i = 70 lands strictly
    * before the end for every len ≥ 72 — so those twins were
    * dhash-identical and exercised only the exact-dup path.) */
  private[graft] def withSeededTwins(docs: DataFrame): DataFrame = {
    // one bounded driver scalar (the fixture-harness variant's price;
    // the oracle mirrors it as a subquery); negative ids shift the
    // offset too, so a twin can never land on a real id
    val r = docs.agg(coalesce(max(col("doc_id")), lit(0L)),
      least(coalesce(min(col("doc_id")), lit(0L)), lit(0L))).head()
    val off = r.getLong(0) + 1 - r.getLong(1)
    // px(1)'s character: position 1 + (len div 72), the second sample.
    // ASCII-only contract (the fixture's, and withPayload's): Spark's
    // chr() wraps code points mod 256 while DuckDB's chr() is a true
    // code point — the two agree exactly on 1..127, which `q + 1`
    // stays inside for ASCII text. Docs whose q-character is code
    // point < 2 OR > 126 are NOT seeded (both engines, and the spec's
    // expected set, apply the same filter): setting the bit needs a
    // first char strictly below q, which doesn't exist below code
    // point 2, and clearing it needs `q + 1`, which at q = 127 (DEL)
    // would be code point 128 — OUTSIDE the 1..127 range where Spark's
    // mod-256 chr() and DuckDB's true-code-point chr() are documented
    // to agree, so the engines would disagree on the twin's text and
    // fake a board mismatch. The clamp would otherwise produce a
    // no-flip (even identical) twin and silently break the
    // Hamming-exactly-1 guarantee.
    val q = "ascii(substr(text, 1 + (length(text) div 72), 1))"
    docs.unionByName(
      docs.filter(col("doc_id") % SeedEvery === 0 && length(col("text")) >= 72 &&
          expr(q) >= 2 && expr(q) <= 126)
        .withColumn("doc_id", col("doc_id") + off)
        .withColumn("text", concat(
          when(expr(q) > expr("ascii(substr(text, 1, 1))"),
            expr(s"chr($q + 1)"))
            .otherwise(expr(s"chr($q - 1)")),
          expr("substr(text, 2)"))))
  }

  private val SeedEvery = 100

  private[graft] def dhashNearDupOver(docs: DataFrame): DataFrame = {
    val sigs = withPayload(docs)
      .filter(length(col("text")) >= 72)
      .select(col("doc_id"), dhashCol.as("dhash"))
    val bands = sigs
      .select(col("doc_id"), col("dhash"), explode(sequence(lit(0), lit(DhashBands - 1))).as("b"))
      .withColumn("band", expr("(dhash div CAST(power(2, b * 16) AS BIGINT)) % 65536"))
    bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.dhash ^ y.dhash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= DhashMaxHamming)
      .orderBy("a", "b")
  }

  private val dhashNearDupSql =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + (SELECT coalesce(max(doc_id), 0) + 1 - least(coalesce(min(doc_id), 0), 0) FROM documents),
       |    chr(CAST(CASE WHEN unicode(substr(text, 1 + (length(text) // 72), 1)) > unicode(substr(text, 1, 1))
       |        THEN unicode(substr(text, 1 + (length(text) // 72), 1)) + 1
       |        ELSE unicode(substr(text, 1 + (length(text) // 72), 1)) - 1 END AS INTEGER))
       |      || substr(text, 2)
       |  FROM documents WHERE doc_id % $SeedEvery = 0 AND length(text) >= 72
       |    AND unicode(substr(text, 1 + (length(text) // 72), 1)) >= 2
       |    AND unicode(substr(text, 1 + (length(text) // 72), 1)) <= 126),
       |sigs AS (
       |  SELECT doc_id, $sqlDhash AS dhash FROM docs WHERE length(text) >= 72),
       |bands AS (
       |  SELECT doc_id, dhash, b, (dhash // CAST(power(2, b * 16) AS BIGINT)) % 65536 AS band
       |  FROM sigs, (SELECT unnest(range(0, $DhashBands)) AS b))
       |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, bit_count(xor(x.dhash, y.dhash)) AS hamming
       |FROM bands x JOIN bands y
       |  ON x.b = y.b AND x.band = y.band AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.dhash, y.dhash)) <= $DhashMaxHamming
       |ORDER BY a, b""".stripMargin

  // ---- image-text pair contamination -------------------------------------

  /** Stand-in benchmark split for pair contamination (same convention
    * as [[Dedup.contamination]]'s BenchSources). */
  private val PairBenchSources = Seq("src0", "src1")

  /** Max document frequency for a caption shingle to count as
    * contamination evidence — [[Dedup]]'s DfCap, same rationale. */
  private val PairDfCap = 1000

  /** Image-text PAIR contamination: a training pair is contaminated if
    * its IMAGE matches a benchmark image byte-for-byte (checksum join —
    * in production, dHash-band join for near-matches) OR its CAPTION
    * shares a df-capped word-5-gram with a benchmark caption — the
    * audit run before training a vision-language model on scraped
    * pairs, where eval images recirculate with rewritten captions and
    * eval captions recirculate over re-encoded images. Both legs are
    * equality joins on hashes (image: one per doc; text: one per
    * distinct shingle), never |corpus| × |benchmark|. */
  def pairContamination(t: Tables): DataFrame =
    pairContaminationCapped(t.documents, PairDfCap)

  /** [[pairContamination]] with the df cap as a parameter, so specs can
    * pin cap behavior on fixtures where it binds. */
  private[graft] def pairContaminationCapped(docs: DataFrame, cap: Int): DataFrame = {
    val d = withPayload(docs)
    val bench = d.filter(col("source").isin(PairBenchSources: _*))
    val corpus = d.filter(!col("source").isin(PairBenchSources: _*))
    val imgHits = corpus.select(col("doc_id"), md5(col("payload")).as("ck"))
      .join(bench.select(md5(col("payload")).as("ck"), col("doc_id").as("bench_id")), "ck")
      .select(col("doc_id"), col("bench_id"), lit("image").as("match_kind"))
    // one shingle relation over ALL pairs (source kept — the same scan
    // feeds the df count and both join legs, ReuseExchange-style)
    val allSh = d
      .withColumn("toks", graft.functions.TextOps.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(expr(
          """CASE WHEN size(toks) >= 5
            |  THEN transform(sequence(0, size(toks) - 5),
            |    i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4]))
            |  ELSE array() END""".stripMargin))).as("shingle"))
      .select(col("doc_id"), col("source"), Hashing.md5Long(col("shingle")).as("sh"))
    // df-cap BEFORE the join ([[Dedup.contamination]]'s rule): a
    // boilerplate caption 5-gram ("all rights reserved …") shared by a
    // benchmark row would otherwise fan out to every corpus occurrence
    // — bounded by |bench| × df, but df of a hot shingle at 100 TB is
    // millions. Ubiquitous shingles are not contamination EVIDENCE
    // anyway; the cap is the operator's semantics, mirrored in the
    // oracle. df counts ALL occurrences (corpus + benchmark).
    val dfOk = allSh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap).select("sh")
    val kept = allSh.join(dfOk, "sh")
    val corpusSh = kept.filter(!col("source").isin(PairBenchSources: _*))
    val benchSh = kept.filter(col("source").isin(PairBenchSources: _*))
      .select(col("sh"), col("doc_id").as("bench_id"))
    val textHits = corpusSh.join(benchSh, "sh")
      .select(col("doc_id"), col("bench_id")).distinct()
      .select(col("doc_id"), col("bench_id"), lit("caption").as("match_kind"))
    imgHits.unionByName(textHits)
      .orderBy("doc_id", "bench_id", "match_kind")
  }

  private val pairContaminationSql = {
    val benchList = PairBenchSources.map(s => s"'$s'").mkString("(", ",", ")")
    s"""WITH d AS (SELECT doc_id, source, text, md5(text) AS ck FROM documents),
       |img AS (
       |  SELECT c.doc_id, b.doc_id AS bench_id, 'image' AS match_kind
       |  FROM d c JOIN d b ON c.ck = b.ck
       |  WHERE c.source NOT IN $benchList AND b.source IN $benchList),
       |sh AS (
       |  SELECT doc_id, source, ${Hashing.sqlMd5Long("shingle")} AS sh FROM (
       |    SELECT doc_id, source, unnest(list_distinct(
       |      list_transform(range(1, greatest(len(toks) - 3, 1)),
       |        i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4]))
       |    )) AS shingle
       |    FROM (SELECT doc_id, source, ${graft.functions.TextOps.sqlTokens("text")} AS toks FROM d))),
       |kept AS (
       |  SELECT sh.* FROM sh
       |  JOIN (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $PairDfCap) k USING (sh)),
       |cap AS (
       |  SELECT DISTINCT c.doc_id, b.doc_id AS bench_id, 'caption' AS match_kind
       |  FROM kept c JOIN kept b ON c.sh = b.sh
       |  WHERE c.source NOT IN $benchList AND b.source IN $benchList)
       |SELECT * FROM (SELECT * FROM img UNION ALL SELECT * FROM cap)
       |ORDER BY doc_id, bench_id, match_kind""".stripMargin
  }

  // ---- per-modality token accounting -------------------------------------

  /** Multimodal context budget (tokens per pack) and ViT patch size. */
  private val MmPackCtx = 2048
  private val VitPatch = 14
  private val FrameTokens = 64

  /** Hash-bucket fan-out within each (source, lang) pack stratum —
    * runtime config `spark.graft.mm.packBuckets` (default 4, the value
    * the oracle pins). At 100 TB a single (source, lang) stratum under
    * 4 buckets is a near-global window funnel: raise the conf with
    * corpus size (buckets ≈ stratum rows / 10M keeps every running-sum
    * partition executor-sized); pack ids stay deterministic for a
    * given setting because the bucket is a doc_id hash, not a split. */
  private[graft] val MmPackBucketsConf = "spark.graft.mm.packBuckets"
  private val MmPackBucketsDefault = 4
  private def mmPackBuckets(spark: org.apache.spark.sql.SparkSession): Int = {
    val n = spark.conf.get(MmPackBucketsConf, MmPackBucketsDefault.toString).toInt
    require(n >= 1, s"$MmPackBucketsConf must be >= 1, got $n")
    n
  }

  /** Board-facing guard ([[Etl.packSequencesBoard]]'s rule): the oracle
    * SQL hardcodes [[MmPackBucketsDefault]], so a tuned session must
    * fail loud here rather than manufacture a fake board mismatch. */
  private[graft] def modalityTokensBoard(t: Tables): DataFrame = {
    val n = mmPackBuckets(t.spark)
    require(n == MmPackBucketsDefault,
      s"$MmPackBucketsConf=$n, but the correctness oracle pins $MmPackBucketsDefault — " +
        "run the board under the default, or regenerate the oracle for the tuned value")
    modalityTokens(t)
  }

  /** Per-modality token accounting + packing: each pair costs its text
    * tokens PLUS its image's ViT patch grid (from the resize plan:
    * ceil(out_w/14) × ceil(out_h/14)) PLUS its sampled frames × a
    * per-frame budget — the numbers a multimodal training loader needs
    * BEFORE any decode happens, so packs are planned from metadata
    * alone. Totals then flow through exactly [[Etl.packSequences]]'s
    * concat-then-chunk window (per (source, lang, hash-bucket) — no
    * global funnel), emitting each pair's pack id and offset under the
    * multimodal context budget. */
  def modalityTokens(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val meta = withPayload(t.documents)
      .withColumn("ck", md5(col("payload")))
      .withColumn("width", Hashing.md5Long(concat(lit("w:"), col("ck"))) % 640 + 1)
      .withColumn("height", Hashing.md5Long(concat(lit("h:"), col("ck"))) % 480 + 1)
      .withColumn("n_frames", Hashing.md5Long(concat(lit("f:"), col("ck"))) % 30 + 1)
      .withColumn("out_w", greatest(lit(1L), expr("(width * 224) div greatest(width, height)")))
      .withColumn("out_h", greatest(lit(1L), expr("(height * 224) div greatest(width, height)")))
      .withColumn("text_tokens",
        size(graft.functions.TextOps.tokens(col("text"))).cast("long"))
      .withColumn("image_tokens",
        (expr(s"(out_w + ${VitPatch - 1}) div $VitPatch") *
          expr(s"(out_h + ${VitPatch - 1}) div $VitPatch")).cast("long"))
      .withColumn("video_tokens",
        (expr("(n_frames + 4) div 5") * FrameTokens).cast("long"))
      .withColumn("total_tokens",
        col("text_tokens") + col("image_tokens") + col("video_tokens"))
    val w = Window.partitionBy(col("source"), col("lang"), col("bucket"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    meta
      // bucket = HASH of doc_id, not doc_id % N: fixture (and plenty of
      // real) corpora assign source/lang BY a doc_id modulus, which
      // makes a modulo bucket constant within a stratum — silently
      // disabling the fan-out exactly where it matters
      .withColumn("bucket", Hashing.bucketCol(col("doc_id"), "pk", mmPackBuckets(t.spark)))
      .withColumn("cum", sum(col("total_tokens")).over(w))
      .select(
        col("doc_id"), col("text_tokens"), col("image_tokens"), col("video_tokens"),
        col("total_tokens"),
        floor((col("cum") - col("total_tokens")) / lit(MmPackCtx.toDouble)).as("pack_id"),
        (col("cum") - col("total_tokens")
          - floor((col("cum") - col("total_tokens")) / lit(MmPackCtx.toDouble)) * MmPackCtx)
          .as("pack_offset"))
      .orderBy("doc_id")
  }

  private val modalityTokensSql =
    s"""SELECT doc_id, text_tokens, image_tokens, video_tokens, total_tokens,
       |  CAST(floor((cum - total_tokens) / ${MmPackCtx}.0) AS BIGINT) AS pack_id,
       |  CAST(cum - total_tokens - floor((cum - total_tokens) / ${MmPackCtx}.0) * $MmPackCtx AS BIGINT) AS pack_offset
       |FROM (
       |  SELECT doc_id, text_tokens, image_tokens, video_tokens, total_tokens,
       |    sum(total_tokens) OVER (PARTITION BY source, lang, bucket ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM (
       |    SELECT doc_id, source, lang,
       |      ${Hashing.sqlBucket("doc_id", "pk", MmPackBucketsDefault)} AS bucket,
       |      text_tokens, image_tokens, video_tokens,
       |      text_tokens + image_tokens + video_tokens AS total_tokens
       |    FROM (
       |      SELECT doc_id, source, lang,
       |        len(${graft.functions.TextOps.sqlTokens("text")}) AS text_tokens,
       |        ((out_w + ${VitPatch - 1}) // $VitPatch) * ((out_h + ${VitPatch - 1}) // $VitPatch) AS image_tokens,
       |        ((n_frames + 4) // 5) * $FrameTokens AS video_tokens
       |      FROM (
       |        SELECT doc_id, source, lang, text, width, height, n_frames,
       |          greatest(1, (width * 224) // greatest(width, height)) AS out_w,
       |          greatest(1, (height * 224) // greatest(width, height)) AS out_h
       |        FROM (
       |          SELECT doc_id, source, lang, text,
       |            ${Hashing.sqlMd5Long("concat('w:', md5(text))")} % 640 + 1 AS width,
       |            ${Hashing.sqlMd5Long("concat('h:', md5(text))")} % 480 + 1 AS height,
       |            ${Hashing.sqlMd5Long("concat('f:', md5(text))")} % 30 + 1 AS n_frames
       |          FROM documents)))))
       |ORDER BY doc_id""".stripMargin

  // ---- image-text pair alignment (CLIP-score filtering) ------------------

  /** Alignment threshold below which a pair is dropped from training. */
  private val AlignTau = 0.93

  /** Image-text PAIR ALIGNMENT filtering — the LAION/DataComp gate: score
    * each (image, caption) pair by the cosine of its image embedding and
    * caption embedding, keep pairs above a threshold. The EMBEDDINGS are
    * the deterministic stubs (a real pipeline plugs a CLIP tower into the
    * same batched decode seam [[features]] owns); the SCORING — two
    * per-row vectors, an explicit-formula cosine in double precision, a
    * threshold verdict — is the real Spark-side shape: pure expressions,
    * no UDF, no shuffle, survives any scale because it is row-local.
    * Component formulas are written identically in both engines so the
    * doubles agree bit-for-bit under round(…,4). */
  def pairAlignment(t: Tables): DataFrame = {
    val d = t.documents
      .withColumn("L", greatest(length(col("text")).cast("double"), lit(1.0)))
      .withColumn("M",
        when(length(col("text")) === 0, lit(0.0)).otherwise(
          expr("aggregate(transform(split(text, ''), c -> ascii(c)), 0D, (a, x) -> a + x)")
            / col("L")))
      .withColumn("F",
        when(length(col("text")) === 0, lit(0.0)).otherwise(ascii(substring(col("text"), 1, 1)).cast("double")))
      .withColumn("Z",
        when(length(col("text")) === 0, lit(0.0)).otherwise(
          expr("ascii(substr(text, length(text), 1))").cast("double")))
      .withColumn("T",
        size(graft.functions.TextOps.tokens(col("text"))).cast("double"))
      .withColumn("W", col("L") / greatest(col("T"), lit(1.0)))
    // image vec = (L, M, F, Z); caption vec = (T, W, Z, F) — the shared
    // components carry genuine association, the swapped pair varies it
    val dot = col("L") * col("T") + col("M") * col("W") + col("F") * col("Z") + col("Z") * col("F")
    val nImg = sqrt(col("L") * col("L") + col("M") * col("M") + col("F") * col("F") + col("Z") * col("Z"))
    val nCap = sqrt(col("T") * col("T") + col("W") * col("W") + col("Z") * col("Z") + col("F") * col("F"))
    d.select(col("doc_id"),
        round(dot / (nImg * nCap), 4).as("clip_score"),
        (dot / (nImg * nCap) >= AlignTau).as("kept"))
      .orderBy("doc_id")
  }

  private val pairAlignmentSql =
    s"""SELECT doc_id, round(dot / (n_img * n_cap), 4) AS clip_score,
       |  dot / (n_img * n_cap) >= $AlignTau AS kept
       |FROM (
       |  SELECT doc_id,
       |    L * T + M * W + F * Z + Z * F AS dot,
       |    sqrt(L * L + M * M + F * F + Z * Z) AS n_img,
       |    sqrt(T * T + W * W + Z * Z + F * F) AS n_cap
       |  FROM (
       |    SELECT doc_id, L, M, F, Z, T, L / greatest(T, 1.0) AS W
       |    FROM (
       |      SELECT doc_id,
       |        greatest(CAST(length(text) AS DOUBLE), 1.0) AS L,
       |        CASE WHEN length(text) = 0 THEN 0.0
       |             ELSE CAST(list_aggregate(list_transform(split(text, ''), c -> unicode(c)), 'sum') AS DOUBLE)
       |                  / greatest(CAST(length(text) AS DOUBLE), 1.0) END AS M,
       |        CASE WHEN length(text) = 0 THEN 0.0
       |             ELSE CAST(unicode(substr(text, 1, 1)) AS DOUBLE) END AS F,
       |        CASE WHEN length(text) = 0 THEN 0.0
       |             ELSE CAST(unicode(substr(text, length(text), 1)) AS DOUBLE) END AS Z,
       |        CAST(len(${graft.functions.TextOps.sqlTokens("text")}) AS DOUBLE) AS T
       |      FROM documents)))
       |ORDER BY doc_id""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("mm_metadata", metadata, Some(metadataSql)),
    QueryDef("mm_resize_plan", resizePlan, Some(resizePlanSql)),
    QueryDef("mm_frame_sample", frameSample, Some(frameSampleSql)),
    QueryDef("mm_features", featuresFlat, Some(featuresSql)),
    QueryDef("mm_dhash_neardup", dhashNearDupSeeded, Some(dhashNearDupSql)),
    QueryDef("mm_pair_contamination", pairContamination, Some(pairContaminationSql)),
    QueryDef("mm_modality_tokens", modalityTokensBoard, Some(modalityTokensSql)),
    QueryDef("mm_pair_alignment", pairAlignment, Some(pairAlignmentSql))
  )
}
