package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** BPE training throughput at a REALISTIC vocabulary size — the number
  * behind the r12 claim that [[graft.functions.Bpe.trainFullBatched]]
  * makes a 32k-merge vocab cost ROUNDS (Spark jobs), not 32k jobs:
  * r12 proved the batching CORRECT (merge-for-merge equal to the
  * sequential trainer over 8 random corpora) but never MEASURED a big
  * run.
  *
  * The fixture corpus cannot host this measurement: its documents hold
  * all-distinct near-random words with unit counts, so every pair
  * count falls below the trainer's `cnt >= 2` floor after ~90 merges
  * (measured). Real tokenizer training data is Zipf-distributed, so
  * the probe synthesizes one DETERMINISTICALLY (seeded): `nVocab`
  * distinct words over a frequency-skewed letter alphabet, counts
  * `~20k / rank^0.8` — about 1.2M word occurrences whose pair
  * histogram stays merge-rich for tens of thousands of merges.
  *
  * Scale shape: per round, ONE distributed pair-count aggregate over
  * the persisted (word-symbols, count) dataset + a driver-side
  * `candidateK`-row collect that selects the largest
  * provably-sequential-equal batch of symbol-disjoint merges — driver
  * memory is O(candidateK), never O(vocab). BPE cost tracks the
  * DISTINCT-word vocabulary, not corpus rows: on a 100 TB corpus the
  * one data-sized job is the word-count aggregate feeding this loop,
  * and everything below is identical. Writes the
  * "## BPE vocab-scale training" SCALE.md section. */
object BpeScaleProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bpe-scale", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val targets = args.toSeq match {
      case Nil => Seq(1024, 8192)
      case xs => xs.map(_.toInt)
    }
    val candidateK = sys.env.getOrElse("SPARK_GRAFT_BPE_K", "4096").toInt
    val nVocab = sys.env.getOrElse("SPARK_GRAFT_BPE_VOCAB", "200000").toInt

    // deterministic Zipf word corpora (seeded PRNG, skewed letters so
    // bigrams overlap the way natural text's do). Two SHAPES (r15):
    // the original ADVERSARIAL one (base 20k / rank^0.8 — the singleton
    // tail's aggregate pair mass decides the earliest merges, the same
    // property the cap-binding BpeSpec test exploits) and a
    // NATURAL-text-shaped one (steeper exponent, head-dominated mass —
    // the shape real web corpora have after normalization), so the
    // truncation-drift table prices the opt-in routes on BOTH instead
    // of letting a reader over-generalize the adversarial numbers.
    def mkCorpus(seed: Int, nWords: Int, base: Double, zipfExp: Double)
        : (org.apache.spark.sql.DataFrame, Seq[(String, Long)], Long) = {
      val rnd = new scala.util.Random(seed)
      val letters = "etaoinshrdlucmfwygpbvkxqjz"
      def word(): String = {
        val len = 3 + rnd.nextInt(8)
        val sb = new StringBuilder(len)
        var i = 0
        while (i < len) {
          sb += letters(math.min(letters.length - 1,
            (math.pow(rnd.nextDouble(), 1.5) * letters.length).toInt))
          i += 1
        }
        sb.toString
      }
      val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
      while (vocab.size < nWords) vocab += word()
      val weighted = vocab.iterator.zipWithIndex.map { case (w, r) =>
        (w, math.max(1L, (base / math.pow(r + 1.0, zipfExp)).toLong))
      }.toSeq
      val docs = weighted.toDF("w", "n")
        .repartition(cpus.toInt)
        .select(explode(expr("sequence(1, n)")).as("i"), col("w"))
        .select(col("w").as("text"))
        .persist()
      (docs, weighted, docs.count())
    }
    val (docs, weighted, occurrences) = mkCorpus(13, nVocab, 20000.0, 0.8)

    val results = targets.map { n =>
      val t0 = System.nanoTime()
      val (table, rounds) = Bpe.trainFullBatched(docs, n, candidateK = candidateK)
      val secs = (System.nanoTime() - t0) / 1e9
      val learned = table.merges.size
      println(f"| distributed batched | $n%,d | $learned%,d | $rounds%,d | ${learned.toDouble / rounds}%.1f | $secs%.1f |")
      (s"distributed batched", n, learned, rounds.toLong, secs)
    }
    // the LOCAL incremental route (r13): trainFull collects the bounded
    // word-count table and trains at heap speed — one Spark job total,
    // so far bigger targets are measurable
    val localResults = Seq(8192, 32768).map { n =>
      val t0 = System.nanoTime()
      val table = Bpe.trainFull(docs, n)
      val secs = (System.nanoTime() - t0) / 1e9
      val learned = table.merges.size
      println(f"| local incremental | $n%,d | $learned%,d | 1 | ${learned.toDouble}%.1f | $secs%.1f |")
      ("local incremental", n, learned, 1L, secs)
    }

    val rows = (results ++ localResults).map { case (path, n, learned, rounds, secs) =>
      f"| $path | $n%,d | $learned%,d | $rounds%,d | ${learned.toDouble / rounds}%.1f | $secs%.1f |"
    }.mkString("\n")

    // r14: merge DRIFT of the opt-in web-scale truncation routes vs the
    // exact trainer at the same target — the number the routes'
    // documented-approximation contract requires (learn_bpe /
    // SentencePiece floor their word tables too, but graft's exactness
    // claim means the cost must be measured, not assumed)
    val driftTarget = 8192
    def driftTable(corpusLabel: String, cDocs: org.apache.spark.sql.DataFrame,
        cWeighted: Seq[(String, Long)], cVocab: Int): Seq[String] = {
      val exactMerges = Bpe.trainFull(cDocs, driftTarget).merges
      def driftOf(label: String, confs: Map[String, String]): (String, Long, Int, Double, Double) = {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val keptWords = {
          val floor = confs.get(Bpe.MinWordCountConf).map(_.toLong).getOrElse(1L)
          val topN = confs.get(Bpe.MaxWordsConf).map(_.toInt).getOrElse(0)
          val base = cWeighted.count(_._2 >= floor).toLong
          if (topN > 0) math.min(base, topN.toLong) else base
        }
        val t0 = System.nanoTime()
        val m = try Bpe.trainFull(cDocs, driftTarget).merges
          finally confs.keys.foreach(spark.conf.unset)
        val secs = (System.nanoTime() - t0) / 1e9
        val lcp = m.zip(exactMerges).takeWhile { case (a, b) => a == b }.size
        val overlap = m.toSet.intersect(exactMerges.toSet).size.toDouble / exactMerges.size
        (label, keptWords, lcp, overlap, secs)
      }
      Seq(
        driftOf("freq floor count >= 2", Map(Bpe.MinWordCountConf -> "2")),
        driftOf(s"top-${cVocab / 4} truncation",
          Map(Bpe.LocalVocabCapConf -> "1", Bpe.MaxWordsConf -> (cVocab / 4).toString))
      ).map { case (label, kept, lcp, overlap, secs) =>
        f"| $corpusLabel | $label | $kept%,d | $driftTarget%,d | $lcp%,d | ${overlap * 100}%.1f%% | $secs%.1f |"
      }
    }
    // natural-shaped corpus (r15): steeper Zipf, head-dominated — ~96% of
    // occurrence mass in the repeated head, the post-normalization shape
    // of real web text. (Measured outcome: drift persists here too —
    // deep merges depend on rare-word pair mass, so occurrence-mass
    // coverage is NOT a safety metric; see the SCALE.md reading.)
    val (docsNat, weightedNat, occNat) = mkCorpus(29, 50000, 300000.0, 1.3)
    val driftRows = (driftTable("adversarial (20k/r^0.8)", docs, weighted, nVocab) ++
      driftTable("natural (300k/r^1.3)", docsNat, weightedNat, 50000)).mkString("\n")
    docsNat.unpersist()
    val statsStr = f"$nVocab%,d distinct words, $occurrences%,d occurrences; natural drift corpus: 50,000 words, $occNat%,d occurrences"
    val section =
      s"""## BPE vocab-scale training
         |
         |Generated by `sbt "runMain graft.BpeScaleProbe"`: `trainFullBatched`
         |(candidateK = $candidateK) over a deterministic Zipf word corpus
         |($statsStr) — the fixture's own documents hold all-distinct
         |near-random words whose pair counts fall below the trainer's
         |`cnt >= 2` floor after ~90 merges, so a realistic-vocab measurement
         |needs a realistic word-frequency shape. Each round is ONE
         |distributed pair-count aggregate + a bounded driver collect; the
         |batch selector applies every merge that is provably
         |order-independent under the sequential trainer's exact tie-break
         |(the r12 correctness work) — which the table shows buys only a
         |small factor over one job per merge (see Reading). BPE cost tracks
         |DISTINCT words, not corpus rows: on a 100 TB corpus the one
         |data-sized job is the word-count aggregate that feeds this loop,
         |and everything below is identical.
         |
         || path | target merges | learned | Spark jobs | merges/job | wall-clock s |
         ||---|---|---|---|---|---|
         |@@ROWS@@
         |
         |Merge drift of the OPT-IN web-scale truncation routes
         |(`spark.graft.bpe.minWordCount`, `spark.graft.bpe.maxWords` —
         |r14) vs the exact trainer at the same target, on this corpus:
         |`lcp` = longest common merge-list prefix, `overlap` = fraction of
         |exact merges the truncated route also learns (any order). The
         |routes are exact RELATIVE TO THE TRUNCATED TABLE by spec
         |(`BpeSpec` pins it); this table prices the truncation itself.
         |Two corpus shapes (r15): the ADVERSARIAL one's tiny lcp is by
         |design — its earliest merges are decided by the singleton
         |tail's aggregate pair mass (the cap-binding BpeSpec property),
         |so any truncation flips the first picks immediately; the
         |NATURAL-shaped corpus (steeper Zipf, ~96% of mass in the
         |repeated head — real web text after normalization) shows the
         |routes' cost in the regime they are FOR. Drift is
         |corpus-dependent and real, which is exactly why the routes are
         |opt-in rather than a silent default: read your corpus's row,
         |not the other one's.
         |
         || corpus | route | kept words | target | lcp | overlap | wall s |
         ||---|---|---|---|---|---|---|
         |@@DRIFT@@
         |
         |Reading: the claim "a big vocab costs rounds, not one job per
         |merge" now has its numbers, and r13 changed the answer's shape.
         |The DISTRIBUTED batched trainer pays one ~0.5 s Spark round per
         |batch, and merges/round stays LOW — single-digit early (top pairs
         |share the few single-char symbols, so the provably-sequential-
         |equal rule stops batches at the first collision) and FALLING
         |deeper in (counts densify into ties, which shrink provable
         |batches) — better than one job per merge, but ~50 minutes to 8k
         |merges. The LOCAL
         |INCREMENTAL route (r13) is how production tokenizer trainers
         |actually run: `trainFull` pays ONE corpus-scale word-count job,
         |then trains the collected weighted vocabulary in-heap with
         |per-word count deltas and a lazy-deletion heap (merge-for-merge
         |equal to the sequential reference by spec) — a 32k vocab in
         |seconds. `trainFull` auto-routes: vocabularies over
         |`spark.graft.bpe.localVocabCap` (default 4M distinct words) take
         |the distributed path; both are exact, so the route never changes
         |the merges. On a 100 TB corpus the word-count aggregate is the
         |one data-sized job either way.
         |""".stripMargin.replace("@@ROWS@@", rows).replace("@@DRIFT@@", driftRows)
    println(section)
    val f = new java.io.File("SCALE.md")
    if (f.exists()) {
      val prev = scala.io.Source.fromFile(f, "UTF-8").mkString
      val start = prev.indexOf("## BPE vocab-scale training")
      val baseDoc =
        if (start < 0) prev
        else {
          val next = prev.indexOf("\n## ", start + 1)
          if (next < 0) prev.substring(0, start) else prev.substring(0, start) + prev.substring(next + 1)
        }
      val outW = new java.io.PrintWriter(f, "UTF-8")
      try outW.print(baseDoc.stripSuffix("\n") + "\n\n" + section) finally outW.close()
      println("updated SCALE.md BPE vocab-scale section")
    } else println("SCALE.md absent — printed only")
    spark.stop()
  }
}
