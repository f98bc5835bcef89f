package graft

import graft.operators.Dedup
import graft.sources.ManifestTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** "Batch cost tracks the BATCH, not the corpus" — the r14 verdict's
  * acceptance criterion for incremental dedup, MEASURED instead of
  * argued: a fixed ~500-doc batch (100 seeded verbatim re-crawls + 400
  * fresh docs) dedupes against a persisted signature index built over
  * sf0.1's documents at corpus scale 1× (5k docs) and 10× (50k docs,
  * the ScaleProbe near-dup-cluster corpus). Three timed numbers per
  * scale:
  *
  *   - `index_build` — the ONE-TIME cost incremental dedup amortizes
  *     (signatures over the whole corpus + table append);
  *   - `batch_step` — the recurring cost: batch signatures, LSH-band +
  *     exact-hash joins against the index READ BACK from the table,
  *     exactly-once append of survivors, verdict localization;
  *   - `full_recompute` — the non-incremental baseline the operator
  *     exists to avoid: re-shingling corpus ∪ batch and self-joining
  *     the bands from scratch.
  *
  * The honest scale claim: the batch step pays O(batch) join work plus
  * ONE scan of the index — a 136-byte-per-doc columnar table, ~15×
  * narrower than re-reading texts — so its cost grows far slower than
  * the corpus and stays a fraction of the recompute at every scale;
  * the table shows both growth rates. Writes the "## Incremental dedup
  * batch-vs-corpus" SCALE.md section. */
object IncrementalDedupProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaled = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    val spark = GraftSession.builder("graft-incr-dedup-probe", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 200) // cluster-like
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    require(new java.io.File(s"$scaled/documents.parquet").exists(),
      s"scaled corpus missing — run ScaleProbe first (builds $scaled)")

    def docsOf(dir: String): DataFrame =
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")

    // the FIXED batch, identical at both scales: 100 verbatim re-crawls
    // of 1×-corpus docs (copy 0 of the scaled corpus — every one must
    // drop at both scales) + 400 synthetic genuinely-fresh docs (id-
    // salted tokens: no shingle overlap with anything, all survive)
    val base = docsOf(src)
    val seeded = base.filter(col("doc_id") % 50 === 0).limit(100)
      .select((col("doc_id") + 10_000_000L).as("doc_id"), col("text"))
    val fresh = spark.range(400).select(
      (col("id") + 20_000_000L).as("doc_id"),
      concat(lit("entirely fresh probe document number "), col("id"),
        lit(" carrying tokens fp"), col("id"), lit("a fp"), col("id"),
        lit("b fp"), col("id"), lit("c")).as("text"))
    val batch = seeded.unionAll(fresh).persist()
    val batchN = batch.count()

    // one UNTIMED full cycle first: the first Spark jobs of a fresh JVM
    // pay codegen/classload warmup that otherwise lands entirely on the
    // 1× row and makes it read SLOWER than 10× (observed 6.3 s vs 2.2 s)
    Seq(("warmup", src)).foreach { case (label, dir) =>
      val corpus = docsOf(dir)
      val root = java.nio.file.Files.createTempDirectory(s"incrprobe$label").toString + "/t"
      ManifestTable.append(spark, root,
        Dedup.bandedIndexOf(Dedup.sigsAllOver(corpus))
          .repartition(col("pbkt")).sortWithinPartitions("bucket"),
        partitionBy = Seq("pbkt"))
      Dedup.candidateDupsIndexed(spark, root, Dedup.sigsAllOver(batch))
        .select("doc_id").distinct().count()
    }

    val rows = Seq(("1x", src), ("10x", scaled)).map { case (label, dir) =>
      val corpus = docsOf(dir)
      val corpusN = corpus.count()
      val root = java.nio.file.Files.createTempDirectory(s"incrprobe$label").toString + "/t"
      val (_, buildS) = time {
        ManifestTable.append(spark, root,
          Dedup.bandedIndexOf(Dedup.sigsAllOver(corpus))
            .repartition(col("pbkt")).sortWithinPartitions("bucket"),
          partitionBy = Seq("pbkt"))
      }
      val (dropped, stepS) = time {
        val batchSigs = Dedup.sigsAllOver(batch)
        val dups = Dedup.candidateDupsIndexed(spark, root, batchSigs)
          .select("doc_id").distinct().persist()
        val n = dups.count()
        val survivors = batchSigs.join(dups, Seq("doc_id"), "left_anti")
        ManifestTable.exactlyOnceMergeWriter(root, Seq("doc_id", "band", "bucket"),
          appId = s"incrprobe$label")(
          Dedup.bandedIndexOf(survivors)
            .repartition(col("pbkt")).sortWithinPartitions("bucket"), 1L)
        dups.unpersist()
        n
      }
      val (pairs, recomputeS) = time {
        val all = corpus.unionAll(batch)
        val sigs = Dedup.sigsAllOver(all)
        val bb = Dedup.bandBucketsOf(sigs)
        bb.as("x").join(bb.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select("x.doc_id").distinct().count()
      }
      // r19: a SECOND timed batch step against the same index — the
      // steady-state repeat (same code path, index one snapshot
      // bigger by the first step's survivors) — so the marginal
      // index-scale cost below compares warm, repeat-regime steps
      val (_, stepS2) = time {
        val batchSigs = Dedup.sigsAllOver(batch)
        Dedup.candidateDupsIndexed(spark, root, batchSigs)
          .select("doc_id").distinct().count()
      }
      (f"| $label | $corpusN%,d | $batchN%,d | $buildS%.1f | $stepS%.1f | $stepS2%.1f | $dropped%,d | $recomputeS%.1f | $pairs%,d |",
        stepS2)
    }

    // FILES-OPENED sweep (r16): against a fixed 10×-corpus banded index,
    // how many index files does a batch probe open as batch size grows?
    // readCandidates is the exact file list the pruned readWhere scans.
    val sweepRoot = java.nio.file.Files.createTempDirectory("incrsweep").toString + "/t"
    ManifestTable.append(spark, sweepRoot,
      Dedup.bandedIndexOf(Dedup.sigsAllOver(docsOf(scaled)))
        .repartition(col("pbkt")).sortWithinPartitions("bucket"),
      partitionBy = Seq("pbkt"))
    val totalFiles = ManifestTable.readCandidates(spark, sweepRoot, lit(true)).size
    val sweep = Seq(1, 10, 100, 500).map { n =>
      val b = batch.limit(n)
      val probe = Dedup.bandedIndexOf(Dedup.sigsAllOver(b))
      val keys = probe.select("pbkt", "bucket").distinct().collect()
      val pred = col("pbkt").isin(keys.map(_.getLong(0)).distinct.toIndexedSeq: _*) &&
        col("bucket").isin(keys.map(_.getLong(1)).distinct.toIndexedSeq: _*)
      val opened = ManifestTable.readCandidates(spark, sweepRoot, pred).size
      f"| $n | ${keys.length}%,d | $opened%,d | $totalFiles%,d |"
    }

    val section =
      s"""## Incremental dedup batch-vs-corpus
         |
         |Generated by `sbt "runMain graft.IncrementalDedupProbe"` (needs the
         |ScaleProbe 10× corpus). A FIXED ~500-doc batch dedupes against a
         |persisted signature index over sf0.1 documents at two corpus
         |scales; `index_build` is the one-time amortized cost, `batch_step`
         |the recurring per-snapshot cost (batch signatures + the PRUNED
         |probe read of the r16 BANDED index — pbkt partition prune plus,
         |for micro-batches, per-file bucket stats skipping — + the two
         |equality joins + exactly-once survivor append), `full_recompute`
         |the whole-corpus self-join the operator replaces. What the table
         |shows at probe scale: the batch step stays ~FLAT when the corpus
         |grows 10× (its join work is O(batch) and its index read is
         |bounded by the batch's buckets), while the recompute's WORK
         |VOLUME grows with the corpus — its candidate-doc column grows
         |~49× even though its wall clock is still dominated by fixed job
         |overhead at these toy sizes. At real crawl scale the recompute's
         |wall clock follows its work volume (it re-shingles every corpus
         |text); the batch step's does not — that is the production claim
         |behind `dedup_incremental`, and the flat batch-step row is its
         |measurable signature. r16 trade, measured: the banded layout's
         |batch step pays ~2 s more than the old whole-index scan at these
         |toy sizes (9× narrower-but-more index rows to append, the
         |repartition+sort write) — the price of the files-opened curve
         |below, which the old layout could never produce (it always read
         |EVERY index file; a 4,500-value stats IN list was also measured
         |at ~12 s of driver expression work pruning nothing, hence the
         |1,024-probe cap in `candidateDupsIndexed`).
         |
         || corpus scale | corpus docs | batch docs | index_build s | batch_step s | probe_repeat s | batch dups dropped | full_recompute s | recompute candidate docs |
         ||---|---|---|---|---|---|---|---|---|
         |${rows.map(_._1).mkString("\n")}
         |
         |Marginal index-scale cost (r19, the funnel discipline applied to
         |the crawl loop): `probe_repeat` is a second, steady-regime probe
         |of the SAME ~$batchN-doc batch (warm JVM, same code path, no
         |append). Crossing a 10× index growth it moved
         |${f"${rows(1)._2 - rows(0)._2}%+.2f"} s
         |(${f"${rows(0)._2}%.2f"} → ${f"${rows(1)._2}%.2f"} s/batch) — the
         |per-batch cost a crawl pays as its index accretes an order of
         |magnitude, i.e. ${f"${(rows(1)._2 - rows(0)._2) / 9.0}%.3f"} s per
         |additional 1× of index. The probe's join work is O(batch); the
         |growth term is the pruned index read (more files under the same
         |probed pbkt/bucket keys).
         |
         |FILES-OPENED sweep (r16 — the banded pbkt-partitioned index):
         |against the fixed 10×-corpus index, the file list a batch probe's
         |pruned `readWhere` scans (partition prune on the batch's pbkt
         |set + per-file bucket min/max vs the probed bucket IN list),
         |versus the table's total file count. Small batches open a small,
         |batch-tracked subset; as probes approach file count the subset
         |saturates — the crossover moves out as the index grows (more
         |files, same probe count), which is exactly the steady-state
         |regime (corpus >> batch) the layout exists for.
         |
         || batch docs | probe keys | files opened | files total |
         ||---|---|---|---|
         |${sweep.mkString("\n")}
         |""".stripMargin
    println(section)
    val f = new java.io.File("SCALE.md")
    if (f.exists()) {
      val prev = scala.io.Source.fromFile(f, "UTF-8").mkString
      val start = prev.indexOf("## Incremental dedup batch-vs-corpus")
      val baseDoc =
        if (start < 0) prev
        else {
          val next = prev.indexOf("\n## ", start + 1)
          if (next < 0) prev.substring(0, start) else prev.substring(0, start) + prev.substring(next + 1)
        }
      val outW = new java.io.PrintWriter(f, "UTF-8")
      try outW.print(baseDoc.stripSuffix("\n") + "\n\n" + section) finally outW.close()
      println("updated SCALE.md incremental-dedup section")
    } else println("SCALE.md absent — printed only")
    spark.stop()
  }
}
