package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.functions._

/** Manifest-parse scale probe: measures the driver-side cost of loading
  * one graft snapshot as the live-file count grows — the format's
  * acknowledged scale ceiling (the whole manifest is read line-by-line
  * on the driver per cold snapshot, where Delta reads parquet
  * checkpoints as data).
  *
  * Method: commit a real 1-file table (real schema/stat headers), then
  * publish synthetic manifests carrying N file entries with full
  * 6-field stats lines per column — byte-shaped exactly like committed
  * manifests — and time `scanState` cold and warm per N, for the text
  * parse AND the parquet checkpoint encoding of the same version.
  * Writes the "## Manifest parse scale" section of SCALE.md (spliced;
  * other probes' sections preserved).
  */
object ManifestScaleProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-manifest-scale", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("manifestscale").toString + "/t"

    val seed = spark.range(0, 10).toDF("id")
      .withColumn("day", lit("2024-01-01").cast("date"))
      .withColumn("v", (col("id") * 10).cast("long"))
    ManifestTable.append(spark, root, seed)

    // v1's header block (op/schema/partition/property lines) is the real
    // thing; synthetic versions reuse it verbatim
    val manifestDir = new java.io.File(s"$root/_manifests")
    val v1 = manifestDir.listFiles().filter(_.getName.endsWith(".manifest")).minBy(_.getName)
    val header = scala.io.Source.fromFile(v1, "UTF-8").getLines()
      .filter(l => l.startsWith("#") &&
        !l.startsWith("# stats:") && !l.startsWith("# dv:")).toList

    val sizes = args.toSeq match {
      case Nil => Seq(10_000, 100_000, 1_000_000)
      case xs => xs.map(_.toInt)
    }
    val results = sizes.zipWithIndex.map { case (n, idx) =>
      val v = 2L + idx
      val path = new java.io.File(manifestDir, s"v${"%020d".format(v)}.manifest")
      val out = new java.io.PrintWriter(
        new java.io.BufferedWriter(new java.io.FileWriter(path), 1 << 20))
      try {
        header.foreach(out.println)
        var i = 0
        while (i < n) {
          val rel = s"data/part-$i-00000000-0000-0000-0000-000000000000.parquet"
          out.println(rel)
          // 6-field stats per column, the committed shape
          out.println(s"# stats:\t$rel\tid\t${i * 100}\t${i * 100 + 99}\t0\t100")
          out.println(s"# stats:\t$rel\tday\t2024-01-01\t2024-01-31\t0\t100")
          out.println(s"# stats:\t$rel\tv\t${i * 1000}\t${i * 1000 + 999}\t0\t100")
          i += 1
        }
      } finally out.close()
      val mb = path.length() / 1e6
      def time[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val cold = time(ManifestTable.scanState(spark, root, Some(v)))
      val warm = time(ManifestTable.scanState(spark, root, Some(v)))
      val st = ManifestTable.scanState(spark, root, Some(v))
      require(st.files.size == n && st.stats.size == n,
        s"parse dropped entries: ${st.files.size} files / ${st.stats.size} stats for $n")
      // parquet checkpoint encoding of the SAME version: write once,
      // then time the checkpoint-served load (scanState prefers it)
      ManifestTable.writeManifestCheckpoint(spark, root, Some(v))
      val ckCold = time(ManifestTable.scanState(spark, root, Some(v)))
      val ckWarm = time(ManifestTable.scanState(spark, root, Some(v)))
      val stCk = ManifestTable.scanState(spark, root, Some(v))
      require(stCk.files == st.files && stCk.stats.size == st.stats.size,
        "checkpoint load diverged from text parse")
      // the real payoff: a FILTERED read's candidate pruning. The
      // checkpoint path evaluates the may-contain condition on
      // executors and returns only survivors; the text path parses the
      // whole manifest on the driver first.
      import org.apache.spark.sql.functions.{col, lit}
      val pred = col("id") === lit(n / 2 * 100 + 7)
      // engagement proof first: readCandidates silently degrades to the
      // text path on any checkpointPrune surprise, which would put a
      // full-parse time in the "ckpt point-prune" column while claiming
      // executors did the work
      require(ManifestTable.checkpointPrune(spark, root, v, pred).isDefined,
        "checkpointPrune fell back to the text path — the column would lie")
      val prCk = time {
        val got = ManifestTable.readCandidates(spark, root, pred, Some(v))
        require(got.size == 1, s"expected 1 surviving file, got ${got.size}")
      }
      println(f"| $n%,d | $mb%.1f | $cold%.2f | $warm%.2f | $ckCold%.2f | $ckWarm%.2f | $prCk%.2f |")
      (n, mb, cold, warm, ckCold, ckWarm, prCk)
    }

    val rows = results.map { case (n, mb, cold, warm, ckCold, ckWarm, prCk) =>
      f"| $n%,d | $mb%.1f | $cold%.2f | $warm%.2f | $ckCold%.2f | $ckWarm%.2f | $prCk%.2f |"
    }.mkString("\n")
    val section =
      s"""## Manifest parse scale
         |
         |Generated by `sbt "runMain graft.ManifestScaleProbe"`: driver-side
         |snapshot-load latency vs live-file count, on manifests byte-shaped like
         |committed ones (one file line + three 6-field stats lines per file,
         |real header block). `scanState` = the full parse every cold table touch
         |pays (reads, DML localization, mirrors); warm = second parse, JIT/page
         |cache warm.
         |
         || live files | manifest MB | text cold s | text warm s | checkpoint cold s | checkpoint warm s | ckpt point-prune s |
         ||---|---|---|---|---|---|---|
         |@@ROWS@@
         |
         |Reading, measured honestly: the single-pass stats accumulator cut
         |the 1M-file cold text load ~3× (50.9 s originally), after which BOTH
         |paths are bound by the same thing — materializing millions of small
         |String/Map objects on the driver — so on LOCAL disk the checkpoint
         |load roughly ties the text parse (the first checkpoint cut tried
         |`spark.read.parquet().collect()` and measured SLOWER; the shipped
         |reader streams parquet-hadoop Groups with no Spark job). What the
         |checkpoint does buy, today and at 100 TB: (1) a ~13× smaller read —
         |26.7 MB vs 361 MB at 1M files — which is the decisive term on
         |object storage, where a cold snapshot is a ranged S3 read, not a
         |page-cache hit; (2) a stats relation executors can scan directly,
         |the prerequisite for moving pruning off the driver entirely (the
         |next step past this boundary). Auto-published when a commit's live
         |file count reaches `graft.checkpoint.minFiles` (default 100k) or
         |explicitly via `writeManifestCheckpoint`; readers prefer it and
         |fall back to text on any miss or corruption; vacuum reclaims it
         |with its version. The `ckpt point-prune` column is the payoff in
         |action: `readCandidates` for an equality predicate through the
         |DISTRIBUTED prune path — executors evaluate the may-contain
         |condition over the checkpoint's columnar stats and only the
         |surviving file rows reach the driver (O(survivors) driver
         |memory, no full parse of any encoding). The text manifest stays
         |the authoritative, arbitrated commit format at every size.
         |""".stripMargin.replace("@@ROWS@@", rows)
    println(section)
    val f = new java.io.File("SCALE.md")
    if (f.exists()) {
      val prev = scala.io.Source.fromFile(f, "UTF-8").mkString
      val start = prev.indexOf("## Manifest parse scale")
      val baseDoc =
        if (start < 0) prev
        else {
          val next = prev.indexOf("\n## ", start + 1)
          if (next < 0) prev.substring(0, start) else prev.substring(0, start) + prev.substring(next + 1)
        }
      val outW = new java.io.PrintWriter(f, "UTF-8")
      try outW.print(baseDoc.stripSuffix("\n") + "\n\n" + section) finally outW.close()
      println("updated SCALE.md manifest section")
    } else println("SCALE.md absent — printed only")
    spark.stop()
  }
}
