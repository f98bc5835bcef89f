package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.functions._

/** Bloom file-index A/B: point lookups over a HASH-DISTRIBUTED
  * high-cardinality string key, where every file's (min, max) range
  * spans the whole key space — the exact shape read-time stats skipping
  * cannot prune — measured with and without `graft.bloom.<col>`
  * sidecars. Files opened is the 100 TB quantity: an equality probe on
  * an unclustered key opens O(table) files without the index and O(1)
  * with it, and re-clustering the table for ONE lookup column
  * (zorderWrite) costs a full rewrite the sidecars avoid.
  *
  * Also reports the index's storage cost (sidecar bytes vs data bytes)
  * and the write-side overhead of building it. Writes the "## Bloom
  * point-lookup skipping" section of SCALE.md.
  *
  * Usage: `sbt "runMain graft.BloomProbe"`; env knobs
  * `SPARK_GRAFT_BLOOM_ROWS` (default 4,000,000),
  * `SPARK_GRAFT_BLOOM_FILES` (default 64), `SPARK_GRAFT_CPUS`.
  */
object BloomProbe {

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BLOOM_ROWS", "4000000").toLong
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_BLOOM_FILES", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bloom-probe", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def freshRoot(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft_bloomprobe_$tag").toString + "/t"

    // hash-distributed by key: every file's lexicographic (min, max)
    // range spans the key space, so min/max skipping keeps everything
    def payload = spark.range(rows).toDF("id")
      .withColumn("k", concat(lit("doc-"), sha2(col("id").cast("string"), 256)))
      .withColumn("v", (col("id") * 7 % 1000).cast("long"))
      .repartition(nFiles, col("k"))

    def bytesUnder(root: String, suffix: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$root/data"))
        .filter(_.getName.endsWith(suffix)).map(_.length()).sum
    }

    // warm the write path once so neither measured write pays first-touch
    // JIT/fs costs, then write the INDEXED table first — any residual
    // warm-up bias disfavors the feature, not the baseline
    val warm = freshRoot("warm")
    ManifestTable.append(spark, warm, payload)

    // ---- bloom-indexed table -----------------------------------------
    val bloomed = freshRoot("bloom")
    ManifestTable.append(spark, bloomed, payload.limit(0))
    ManifestTable.setProperty(spark, bloomed, "graft.bloom.k", "0.01")
    val (_, tWriteBloom) = timed(ManifestTable.append(spark, bloomed, payload))

    // ---- plain table (no index) --------------------------------------
    val plain = freshRoot("plain")
    val (_, tWritePlain) = timed(ManifestTable.append(spark, plain, payload))

    val dataBytes = bytesUnder(bloomed, ".parquet")
    val bloomBytes = bytesUnder(bloomed, ".bloom")

    // probe keys: some present, some absent
    val present = Seq(42L, rows / 2, rows - 7).map(i =>
      s"doc-${java.security.MessageDigest.getInstance("SHA-256")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString}")
    val absent = Seq("doc-absent-1", "doc-absent-2")

    def lookup(root: String, key: String): (Long, Int, Double) = {
      val opened = ManifestTable.readCandidates(spark, root, col("k") === key).length
      val (n, t) = timed(
        ManifestTable.readWhere(spark, root, col("k") === key).count())
      (n, opened, t)
    }
    // warm both tables once
    lookup(plain, present.head); lookup(bloomed, present.head)

    val lines = new scala.collection.mutable.ArrayBuffer[String]
    lines += "## Bloom point-lookup skipping"
    lines += ""
    lines += s"`BloomProbe` — ${rows / 1000000}M rows, $nFiles hash-distributed files"
    lines += s"(every file's min/max spans the key space), local[$cpus]. Equality"
    lines += "probes on the unclustered key, `readWhere` with vs without"
    lines += "`graft.bloom.k = 0.01` sidecars:"
    lines += ""
    lines += "| probe | files plain | files bloom | t plain (s) | t bloom (s) | rows |"
    lines += "|---|---|---|---|---|---|"
    (present.map(k => (s"present key", k)) ++ absent.map(k => ("absent key", k)))
      .foreach { case (label, k) =>
        val (nP, oP, tP) = lookup(plain, k)
        val (nB, oB, tB) = lookup(bloomed, k)
        require(nP == nB, s"$label: row mismatch $nP vs $nB")
        val row = f"| $label | $oP | $oB | $tP%.2f | $tB%.2f | $nB |"
        lines += row
        println(row)
      }
    lines += ""
    lines += f"Write cost: ${tWritePlain}%.1f s plain vs ${tWriteBloom}%.1f s with the"
    lines += f"index build (one extra column-pruned scan of the staged bytes); sidecars"
    lines += f"total ${bloomBytes / 1024.0 / 1024.0}%.1f MB over ${dataBytes / 1024.0 / 1024.0}%.1f MB"
    lines += "of parquet. False positives cost one file open; absent keys typically"
    lines += "open zero files."
    val section = lines.mkString("\n") + "\n"

    val f = new java.io.File("SCALE.md")
    if (f.exists()) {
      val prev = scala.io.Source.fromFile(f, "UTF-8").mkString
      val start = prev.indexOf("## Bloom point-lookup skipping")
      val baseDoc =
        if (start < 0) prev
        else {
          val next = prev.indexOf("\n## ", start + 1)
          if (next < 0) prev.substring(0, start) else prev.substring(0, start) + prev.substring(next + 1)
        }
      val out = new java.io.PrintWriter(f, "UTF-8")
      try out.print(baseDoc.stripSuffix("\n") + "\n\n" + section) finally out.close()
      println("updated SCALE.md bloom section")
    } else println("SCALE.md absent — printed only")
    spark.stop()
  }
}
