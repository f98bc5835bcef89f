package graft

import graft.functions.{Bpe, BpeTable}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("merge passes are leftmost non-overlapping, in rank order") {
    val t = new BpeTable(Seq("a" -> "a"))
    assert(t.encode("aaa").toSeq === Seq("aa", "a"))
    assert(t.encode("aaaa").toSeq === Seq("aa", "aa"))
    val t2 = new BpeTable(Seq("a" -> "b", "ab" -> "c"))
    assert(t2.encode("abc").toSeq === Seq("abc"))
    assert(t2.encode("abab").toSeq === Seq("ab", "ab"))
    // later merge consumes an earlier product, never the reverse
    assert(t2.encode("cab").toSeq === Seq("c", "ab"))
  }

  test("topological validation rejects merges over not-yet-existing symbols") {
    val err = intercept[IllegalArgumentException] {
      new BpeTable(Seq("ab" -> "c", "a" -> "b"))
    }
    assert(err.getMessage.contains("topologically valid"))
  }

  test("default table compresses corpus words; boundary keeps merges word-local") {
    val t = Bpe.defaultTable
    assert(t.encode("table").toSeq === Seq("table"))
    assert(t.encode("data").toSeq === Seq("data"))
    assert(t.encode("the_scan").toSeq === Seq("the", "_", "scan"))
    // no merge crosses the boundary marker
    assert(t.countTokens("a_a") === 3)
  }

  test("codegen expression equals the driver-side table on real documents") {
    val t = graft.sources.Tables(spark, sf0001)
    val got = t.documents
      .select(col("doc_id"), col("text"), Bpe.tokenCount(col("text")).as("n"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val stream = r.getString(1).trim.toLowerCase
        .replaceAll("\\s+", " ").replace(' ', '_')
      assert(r.getInt(2) === Bpe.defaultTable.countTokens(stream),
        s"doc ${r.getLong(0)}: expression disagrees with driver-side table")
    }
    // and the expression is strictly tighter than the /4 estimate's
    // ceiling on at least some docs (the A/B has signal)
    val cmp = t.documents.select(
      sum(Bpe.tokenCount(col("text")).cast("long")).as("bpe"),
      sum(ceil(col("n_chars") / lit(4.0)).cast("long")).as("est")).head()
    assert(cmp.getLong(0) > 0 && cmp.getLong(0) != cmp.getLong(1))
  }

  test("property: encode is lossless, count-consistent, and never grows (random tables + inputs)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val alpha = Gen.choose('a', 'f') // small alphabet → merges actually fire
    val inputGen = Gen.listOfN(40, alpha).map(_.mkString)
    // random topologically-valid tables: each merge pairs two symbols
    // drawn from {chars} ∪ {earlier products}
    val tableGen: Gen[BpeTable] = Gen.listOfN(8, Gen.choose(0, Int.MaxValue)).map { seeds =>
      val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
      val symbols = scala.collection.mutable.ArrayBuffer("a", "b", "c", "d", "e", "f")
      seeds.foreach { s =>
        val a = symbols(math.abs(s) % symbols.size)
        val b = symbols(math.abs(s / 7) % symbols.size)
        merges += (a -> b); symbols += (a + b)
      }
      new BpeTable(merges.toList)
    }
    val prop: Prop = forAll(tableGen, inputGen) { (t: BpeTable, s: String) =>
      val enc = t.encode(s)
      // lossless: concatenating the tokens reproduces the input exactly
      enc.mkString == s &&
        // count face agrees with the token sequence
        t.countTokens(s) == enc.length &&
        // merging never grows the sequence
        enc.length <= s.length &&
        // deterministic
        t.encode(s).toSeq == enc.toSeq
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("training learns the corpus's most frequent pair first, deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab abab cd", "en", "s", 0L),
      (2L, "abab cd cd", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = Bpe.train(docs, nMerges = 3)
    // pair (a,b) is the most frequent adjacent pair (2 per "abab" × 3
    // occurrences = 6, weighted by word counts) — merged first
    assert(t.merges.head === ("a" -> "b"))
    // deterministic: identical corpus → identical merges
    assert(Bpe.train(docs, nMerges = 3).merges === t.merges)
    // trained table compresses the words it saw
    assert(t.countTokens("abab") < 4)
  }

  test("trained table plugs into the codegen expression and compresses the corpus") {
    val t = graft.sources.Tables(spark, sf0001)
    val trained = Bpe.train(t.documents, nMerges = 64)
    assert(trained.merges.size === 64)
    val cmp = t.documents.select(
      sum(Bpe.tokenCount(col("text"), trained.merges).cast("long")).as("trained"),
      sum(Bpe.tokenCount(col("text")).cast("long")).as("fixture"),
      sum(length(col("text")).cast("long")).as("chars")).head()
    // a corpus-learned vocabulary beats the hand-written demo table,
    // and both beat raw characters
    assert(cmp.getLong(0) < cmp.getLong(1))
    assert(cmp.getLong(1) < cmp.getLong(2))
  }

  test("substring keep-first: the corpus-wide first occurrence survives") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon tail one", "en", "s1", 0L),
      (2L, "head alpha beta gamma delta epsilon tail", "en", "s1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val spans = graft.operators.Dedup.substringKeepFirstOver(docs, 3)
    val rows = spans.collect()
    // doc 1 holds every first occurrence → no spans; doc 2's repeat flagged
    assert(rows.forall(_.getLong(0) == 2L), rows.mkString(","))
    assert(rows.nonEmpty)
  }

  test("substring spans: anchors merge into maximal spans per document") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s1", 0L),
      (2L, "prefix alpha beta gamma delta epsilon suffix tail", "en", "s1", 0L),
      (3L, "unrelated words only here nothing shared at all", "en", "s2", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val spans = graft.operators.Dedup.substringSpansOver(docs, 3).collect()
    // docs 1 and 2 share "alpha beta gamma delta epsilon" = 5 tokens →
    // anchors at 3-gram positions merge into one span each; doc 3 clean
    val byDoc = spans.groupBy(_.getLong(0))
    assert(byDoc.keySet === Set(1L, 2L))
    val s1 = byDoc(1L).map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(s1 === Seq((0L, 4L, 5L)), s"doc 1 span: $s1")
    val s2 = byDoc(2L).map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(s2 === Seq((1L, 5L, 5L)), s"doc 2 span: $s2")
  }

  test("trainFull: distributed training matches uncapped driver training; the cap demonstrably binds") {
    import spark.implicits._
    // 25 head words × 3 occurrences carry pair (q,w) mass 75; 100 rare
    // tail words × 1 carry pair (z,x) mass 100 — frequent sub-string
    // spread across many rare surface forms, the shape web corpora have
    val heads = (0 until 25).map(i => f"qw$i%02d")
    val tails = (0 until 100).map(i => f"zx$i%02d")
    val corpus = Seq(
      (heads.flatMap(w => Seq.fill(3)(w)) ++ tails).mkString(" ")).toDF("text")
    // r13: trainFull auto-routes small vocabularies to the local
    // incremental trainer — force the DISTRIBUTED path here (cap 0) so
    // this test keeps pinning the batched rounds, then check the local
    // route lands on the identical merges
    spark.conf.set(Bpe.LocalVocabCapConf, "0")
    val full = try Bpe.trainFull(corpus, 6)
      finally spark.conf.unset(Bpe.LocalVocabCapConf)
    val uncapped = Bpe.train(corpus, 6, maxVocab = 1 << 20)
    assert(full.merges === uncapped.merges,
      "distributed rounds must reproduce the driver reference exactly when nothing is capped")
    assert(Bpe.trainFull(corpus, 6).merges === uncapped.merges,
      "the local-route trainFull must learn the identical merges")
    assert(full.merges.head === ("z" -> "x"),
      "the tail's aggregate pair mass must win uncapped training")
    // a binding cap (top-25 words = the heads only) hides that mass
    val capped = Bpe.train(corpus, 6, maxVocab = 25)
    assert(capped.merges.head === ("q" -> "w"),
      "the cap sees only head words, so the head pair wins")
    assert(capped.merges !== full.merges, "the cap must demonstrably change the merges here")
    // and the trained-full merges drive the same encoder machinery
    assert(new BpeTable(full.merges.take(1)).countTokens("zx01") === 3) // [zx, 0, 1]
  }

  test("trainFull batches symbol-disjoint merges in one round, merge-for-merge equal to sequential") {
    import spark.implicits._
    // five frequent pairs over disjoint symbols with strictly separated
    // counts — the shape where batching takes them all at once
    val words = Seq.fill(50)("ab") ++ Seq.fill(40)("cd") ++ Seq.fill(30)("ef") ++
      Seq.fill(20)("gh") ++ Seq.fill(10)("ij")
    val corpus = Seq(words.mkString(" ")).toDF("text")
    val (table, rounds) = Bpe.trainFullBatched(corpus, 5)
    val ref = Bpe.train(corpus, 5, maxVocab = 1 << 20)
    assert(table.merges === ref.merges)
    assert(table.merges.length === 5)
    assert(rounds === 1, s"batching must engage: got $rounds rounds for 5 merges")
  }

  test("trainFull tie/interference guards: random corpora stay merge-for-merge equal to sequential") {
    import spark.implicits._
    // small alphabet + repeated words ⇒ dense ties, shared symbols,
    // product collisions (earlier products recur as later pair sides):
    // every guard in selectMergeBatch gets exercised
    val rnd = new scala.util.Random(42)
    (0 until 8).foreach { trial =>
      val alphabet = "abcd"
      val nWords = 30 + rnd.nextInt(40)
      val words = Seq.fill(nWords) {
        val len = 2 + rnd.nextInt(5)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val corpus = Seq(words.mkString(" ")).toDF("text")
      val nMerges = 10
      val (batched, _) = Bpe.trainFullBatched(corpus, nMerges)
      val ref = Bpe.train(corpus, nMerges, maxVocab = 1 << 20)
      assert(batched.merges === ref.merges,
        s"trial $trial diverged: batched=${batched.merges} ref=${ref.merges} corpus=${words.mkString(" ")}")
      // r13: the incremental local trainer (trainFull's small-vocab
      // route — lazy-deletion heap, per-word count deltas) must stay
      // merge-for-merge equal on the same dense-tie corpora
      assert(Bpe.trainFull(corpus, nMerges).merges === ref.merges,
        s"trial $trial: local incremental trainer diverged from sequential")
    }
  }

  test("local incremental trainer: extended random stress (deep merges, early-stop parity)") {
    import spark.implicits._
    // deeper than the batched stress: varied alphabets, duplicated
    // word mass (heavy ties), and merge budgets large enough to hit
    // the cnt>=2 exhaustion floor — the local trainer must match the
    // sequential reference merge-for-merge INCLUDING where it stops
    val rnd = new scala.util.Random(7)
    (0 until 12).foreach { trial =>
      val alphabet = "abcdef".take(3 + rnd.nextInt(4))
      val nWords = 40 + rnd.nextInt(120)
      val words = Seq.fill(nWords) {
        val len = 2 + rnd.nextInt(7)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val corpus = Seq((words ++ words.take(nWords / 2)).mkString(" ")).toDF("text")
      val nMerges = 25 + rnd.nextInt(30)
      val ref = Bpe.train(corpus, nMerges, maxVocab = 1 << 20)
      val local = Bpe.trainFull(corpus, nMerges) // small vocab => local route
      assert(local.merges === ref.merges,
        s"trial $trial diverged (ref ${ref.merges.size} merges, local ${local.merges.size})")
    }
  }

  test("selectMergeBatch: two same-product pairs end the batch (joint creations void the bound)") {
    // (a,bc) and (ab,c) both produce "abc": their creations SUM, so a
    // later pair with a lower count than the combined created mass
    // (here (d,e)=80 < 60+60 possible for (x,abc)) must not ride the
    // same batch — sequential could pick the created pair first
    val eligible = Array(("a", "bc", 100L), ("ab", "c", 90L), ("d", "e", 80L))
    val symbols = Set("a", "b", "c", "d", "e", "x", "ab", "bc")
    val batch = Bpe.selectMergeBatch(eligible, symbols, maxN = 10)
    assert(batch === Seq("a" -> "bc", "ab" -> "c"),
      s"the second same-product pair must END the batch, got $batch")
  }

  test("selectMergeBatch: a product equal to an earlier accepted SIDE ends the batch") {
    // accepted ("abc","d"); then ("ab","c") produces "abc" — new "abc"
    // symbols resurrect (abc, d) adjacencies for later rounds, so
    // nothing may be accepted after it in this batch
    val eligible = Array(("abc", "d", 100L), ("ab", "c", 90L), ("e", "f", 80L))
    val symbols = Set("a", "b", "c", "d", "e", "f", "ab", "abc")
    val batch = Bpe.selectMergeBatch(eligible, symbols, maxN = 10)
    assert(batch === Seq("abc" -> "d", "ab" -> "c"), s"got $batch")
  }

  test("trainFull batching respects the merge budget mid-batch") {
    import spark.implicits._
    val words = Seq.fill(9)("ab") ++ Seq.fill(8)("cd") ++ Seq.fill(7)("ef")
    val corpus = Seq(words.mkString(" ")).toDF("text")
    val (table, _) = Bpe.trainFullBatched(corpus, 2)
    val ref = Bpe.train(corpus, 2, maxVocab = 1 << 20)
    assert(table.merges === ref.merges)
    assert(table.merges.length === 2)
  }

  test("trainFull web-scale routes: char byte-gate, frequency floor, top-N truncation — contracts pinned") {
    import spark.implicits._
    val heads = (0 until 25).map(i => f"qw$i%02d")
    val tails = (0 until 100).map(i => f"zx$i%02d")
    val corpus = Seq(
      (heads.flatMap(w => Seq.fill(3)(w)) ++ tails).mkString(" ")).toDF("text")
    val exact = Bpe.train(corpus, 6, maxVocab = 1 << 20)

    // the CHAR gate (the ADVICE finding: word count alone is a poor
    // memory proxy) reroutes a small-word-count corpus to the
    // distributed path — which is exact, so merges are unchanged
    spark.conf.set(Bpe.LocalCharsCapConf, "1")
    try assert(Bpe.trainFull(corpus, 6).merges === exact.merges,
      "an over-chars-cap vocabulary must still train exactly (distributed route)")
    finally spark.conf.unset(Bpe.LocalCharsCapConf)

    // frequency floor (opt-in): merges equal EXACT training on the
    // floored word table — here floor 2 drops the 100 singleton tail
    // words, so the head pair must win where unfloored training
    // picked the tail pair
    spark.conf.set(Bpe.MinWordCountConf, "2")
    val floored = try Bpe.trainFull(corpus, 6)
      finally spark.conf.unset(Bpe.MinWordCountConf)
    val flooredRef = Bpe.train(
      Seq(heads.flatMap(w => Seq.fill(3)(w)).mkString(" ")).toDF("text"),
      6, maxVocab = 1 << 20)
    assert(floored.merges === flooredRef.merges,
      "floored trainFull must equal exact training on the floored table")
    assert(floored.merges.head === ("q" -> "w") && exact.merges.head === ("z" -> "x"),
      "the floor must demonstrably bind on this corpus")

    // top-N truncation (opt-in) routes an over-cap vocabulary locally
    // on the N heaviest words under the deterministic (count desc,
    // word asc) order: top 25 = exactly the heads
    spark.conf.set(Bpe.LocalVocabCapConf, "10") // forces the over-cap branch
    spark.conf.set(Bpe.MaxWordsConf, "25")
    val truncated = try Bpe.trainFull(corpus, 6)
      finally { spark.conf.unset(Bpe.LocalVocabCapConf); spark.conf.unset(Bpe.MaxWordsConf) }
    assert(truncated.merges === flooredRef.merges,
      "top-N truncation must equal exact training on the N heaviest words")

    // the char gate applies to the TRUNCATED table too (r14 ADVICE: N
    // heavy long words could still blow the driver heap the gate
    // bounds) — the failing gate reroutes to the distributed trainer
    // ON the truncated table, so merges are unchanged
    spark.conf.set(Bpe.LocalVocabCapConf, "10")
    spark.conf.set(Bpe.MaxWordsConf, "25")
    spark.conf.set(Bpe.LocalCharsCapConf, "1")
    val truncGated = try Bpe.trainFull(corpus, 6)
      finally {
        spark.conf.unset(Bpe.LocalVocabCapConf); spark.conf.unset(Bpe.MaxWordsConf)
        spark.conf.unset(Bpe.LocalCharsCapConf)
      }
    assert(truncGated.merges === flooredRef.merges,
      "an over-chars-cap TRUNCATED table must train exactly on the distributed route")

    // defaults: no floor, no truncation — the routes above are opt-in
    assert(Bpe.trainFull(corpus, 6).merges === exact.merges)
  }

  test("byte-level mode: 256-byte alphabet; UTF-8 fixtures diverge from char mode both ways; " +
    "trained byte tables replay exactly") {
    import spark.implicits._
    val rows = Seq("\u00e4n", "an").toDF("text")
      .select(col("text"),
        Bpe.tokenCountBytes(col("text")).cast("long").as("b"),
        Bpe.tokenCount(col("text")).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 'a\u0308n' ("\u00e4n") = UTF-8 bytes C3 A4 6E: the byte table fuses
    // C3+A4 then chains +n -> ONE byte token; char mode has no
    // '\u00e4'-consuming merge -> two symbols
    assert(rows("\u00e4n") === ((1L, 2L)))
    // 'an' merges in char mode (a+n) but the byte demo table has no a+n
    assert(rows("an") === ((2L, 1L)))
    // byteStream: one ISO-8859-1 char per UTF-8 byte
    assert(Seq("\u00e4").toDF("text")
      .select(length(Bpe.byteStream(col("text")))).head().getInt(0) === 2)

    // trainBytes learns merges IN BYTE SPACE (the BpeTable constructor
    // enforces topological validity there) and the codegen expression
    // replays the trained table exactly against a driver-side replay of
    // the same latin1 stream
    val text = "w\u00f6rld w\u00f6rld w\u00f6rld h\u00e4llo h\u00e4llo"
    val corpus = Seq(text).toDF("text")
    val t = Bpe.trainBytes(corpus, 4)
    assert(t.merges.nonEmpty)
    val latin1 = new String(text.getBytes("UTF-8"), "ISO-8859-1")
    val got = corpus.select(Bpe.tokenCountBytes(col("text"), t.merges).cast("long")).head().getLong(0)
    assert(got === t.countTokens(latin1).toLong)
    // the learned merges genuinely compress the multi-byte words
    assert(got < latin1.length)
  }

  test("regex pre-tokenization: matches tile the text; boundary merges blocked; " +
    "contraction/digit/punct arms split as GPT-2 does") {
    import spark.implicits._
    val pat = java.util.regex.Pattern.compile(Bpe.PretokPattern)
    def pretoks(s: String): Seq[String] = {
      val m = pat.matcher(s); val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    // totality: matches tile an adversarial mixed string completely
    val adversarial = "it's 2026  value42\tred-blue!\n  x"
    assert(pretoks(adversarial).mkString === adversarial,
      "every char class must have an arm — nothing silently dropped")
    // GPT-2 splits: contraction off the word, digits off letters,
    // punctuation its own run, space prefixes the following word
    assert(pretoks("it's value42") === Seq("it", "'s", " value", "42"))
    assert(pretoks("red-blue!") === Seq("red", "-", "blue", "!"))
    // the crossing merge ("ue"+"4") fires in plain mode, never in
    // pretok mode: "value42" plain -> [val|ue4|2], pretok -> [val|ue|4|2]
    val tbl = new BpeTable(Bpe.PretokDemoMerges)
    assert(tbl.countTokens("value42") === 3)
    assert(tbl.countTokensPretok("value42", pat) === 4)
    // codegen expression agrees with the driver-side table
    val rows = Seq("it's value42", "red-blue! 99").toDF("text")
      .select(col("text"),
        Bpe.tokenCountPretok(col("text")).cast("long").as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("it's value42") ===
      pretoks("it's value42").map(tbl.countTokens).sum.toLong)
    assert(rows("red-blue! 99") ===
      pretoks("red-blue! 99").map(tbl.countTokens).sum.toLong)
    // raw-text convention: pretok mode never case-folds (GPT-2), so an
    // uppercase word blocks the lowercase merges plain mode would fire
    assert(tbl.countTokensPretok("THE the", pat) === 3 + 2,
      "THE stays 3 unmerged symbols; ' the' merges to [_?]... the")
  }

  test("composed GPT-2 shape: pre-tokenize on TEXT, then byte-level BPE per pre-token") {
    import spark.implicits._
    val pat = java.util.regex.Pattern.compile(Bpe.PretokPattern)
    val tbl = new BpeTable(Bpe.Gpt2DemoMerges)
    // the crossing byte merge ("Ã¤n"+"4") fires in plain byte mode on
    // "än42" but pre-tokenization splits the letter|digit seam first
    def latin1(s: String) = new String(s.getBytes("UTF-8"), "ISO-8859-1")
    assert(tbl.countTokens(latin1("än42")) === 2) // [Ã¤n4|2]
    assert(tbl.countTokensPretokBytes("än42", pat) === 3) // [Ã¤n][4|2]
    // the regex MUST tile the raw text, not the latin1 stream: re-read
    // bytes would split 'ä' into two latin1 chars, one of them (¤) not
    // a letter — the pre-token would shear mid-character
    assert(tbl.countTokensPretokBytes("än än", pat) === 1 + 2,
      "first 'än' = [Ã¤n]; ' än' = [0x20][Ã¤n]")
    // codegen expression = driver-side table on a mixed fixture
    val fixture = "än42 it's the änd"
    val got = Seq(fixture).toDF("text")
      .select(Bpe.tokenCountGpt2(col("text")).cast("long")).head().getLong(0)
    val m = pat.matcher(fixture)
    var want = 0L
    while (m.find()) want += tbl.countTokens(latin1(m.group()))
    assert(got === want)
  }

  test("encode: token sequences match the driver-side table positionally; SQL faces resolve") {
    import spark.implicits._
    val df = Seq((1L, "the data table"), (2L, "scan and join")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Bpe.encodeTokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    def expected(s: String) =
      Bpe.defaultTable.encode(s.toLowerCase.trim.replaceAll("\\s+", " ")
        .replace(' ', '_')).toSeq
    assert(got(1L) === expected("the data table"))
    assert(got(2L) === expected("scan and join"))
    // count face = length of encode face, always
    val both = df.select(
      size(Bpe.encodeTokens(col("text"))).as("n1"),
      Bpe.tokenCount(col("text")).as("n2")).collect()
    assert(both.forall(r => r.getInt(0) === r.getInt(1)))
    // count face = length of encode face in the PRETOK and GPT-2 modes too
    val modal = Seq("it's value42 änd").toDF("text").select(
      size(Bpe.encodeTokensPretok(col("text"))).as("ep"),
      Bpe.tokenCountPretok(col("text")).as("cp"),
      size(Bpe.encodeTokensGpt2(col("text"))).as("eg"),
      Bpe.tokenCountGpt2(col("text")).as("cg")).head()
    assert(modal.getInt(0) === modal.getInt(1), "pretok encode length = pretok count")
    assert(modal.getInt(2) === modal.getInt(3), "gpt2 encode length = gpt2 count")
    // SQL registration: bpe_encode / bpe_token_count resolve through the
    // extensions seam under the same default table
    df.createOrReplaceTempView("bpe_sql_probe")
    val viaSql = spark.sql(
      "SELECT doc_id, bpe_encode(text) AS toks, bpe_token_count(text) AS n " +
        "FROM bpe_sql_probe ORDER BY doc_id").collect()
    assert(viaSql(0).getSeq[String](1) === expected("the data table"))
    assert(viaSql(0).getInt(2) === expected("the data table").length)
    // the GPT-2 SQL faces ride the same flagged expressions
    val gpt2 = spark.sql(
      "SELECT bpe_encode_gpt2(text) AS toks, bpe_token_count_gpt2(text) AS n " +
        "FROM bpe_sql_probe WHERE doc_id = 1").head()
    assert(gpt2.getSeq[String](0).length === gpt2.getInt(1))
    val gpt2Tbl = new BpeTable(Bpe.Gpt2DemoMerges)
    val pat2 = java.util.regex.Pattern.compile(Bpe.PretokPattern)
    assert(gpt2.getInt(1) === gpt2Tbl.countTokensPretokBytes("the data table", pat2))
    spark.catalog.dropTempView("bpe_sql_probe")
  }

  test("merges artifact: train-save-load round-trips; tampered artifacts fail loud") {
    import spark.implicits._
    val corpus = Seq("the data table scans the data", "value and data join the table")
      .toDF("text")
    val trained = Bpe.trainFull(corpus, 6)
    val dir = java.nio.file.Files.createTempDirectory("bpeart").toString + "/merges"
    Bpe.saveMerges(spark, trained, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded.merges === trained.merges)
    // the loaded table tokenizes identically through the codegen expression
    val a = corpus.select(Bpe.tokenCount(col("text"), trained.merges).cast("long")).collect()
    val b = corpus.select(Bpe.tokenCount(col("text"), loaded.merges).cast("long")).collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    // re-save REPLACES (the versioned-by-path production convention)
    Bpe.saveMerges(spark, new BpeTable(trained.merges.take(2)), dir)
    assert(Bpe.loadMerges(spark, dir).merges === trained.merges.take(2))
    // a rank gap fails loud
    val gapDir = java.nio.file.Files.createTempDirectory("bpeart").toString + "/gap"
    Seq((0, "t", "h"), (2, "th", "e")).toDF("rank", "left", "right").write.parquet(gapDir)
    val eGap = intercept[IllegalArgumentException](Bpe.loadMerges(spark, gapDir))
    assert(eGap.getMessage.contains("gaps"))
    // a topology-breaking shuffle fails loud via the table constructor
    val badDir = java.nio.file.Files.createTempDirectory("bpeart").toString + "/bad"
    Seq((0, "th", "e"), (1, "t", "h")).toDF("rank", "left", "right").write.parquet(badDir)
    val eBad = intercept[IllegalArgumentException](Bpe.loadMerges(spark, badDir))
    assert(eBad.getMessage.contains("topologically"))
  }
}
