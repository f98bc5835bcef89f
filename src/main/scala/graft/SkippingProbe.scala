package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.functions._

/** Read-path data-skipping A/B: the same filtered aggregate over a
  * range-sorted [[ManifestTable]], once through `read().filter(pred)`
  * (every live file opened) and once through
  * [[ManifestTable.readWhere]] (manifest stats prune the file list
  * before the reader sees it — Delta's read-time skipping, which the
  * reference inherits from `format("delta")`,
  * pipeline/airflow/dags/load_data_task.py:147).
  *
  * The quantity that matters at 100 TB is FILES OPENED — a selective
  * predicate over a clustered layout should open O(matching range)
  * files, not O(table). Wall-clock at probe scale mostly tracks the
  * scan setup + footer reads this avoids; at cluster scale it tracks
  * the I/O itself. Writes the "## Read-time data skipping" section of
  * SCALE.md (spliced, preserved by ScaleProbe reruns).
  *
  * Usage: `sbt "runMain graft.SkippingProbe"`; env knobs
  * `SPARK_GRAFT_SKIP_ROWS` (default 4,000,000), `SPARK_GRAFT_SKIP_FILES`
  * (default 64), `SPARK_GRAFT_CPUS`.
  */
object SkippingProbe {

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKIP_ROWS", "4000000").toLong
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_SKIP_FILES", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-skipping-probe", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_skipprobe").toString + "/t"
    // range-sorted layout — what zorderWrite / compact(zorderBy) maintain:
    // each file holds a tight contiguous id range; payload pads files to
    // realistic row widths so "files opened" translates to real bytes
    val df = spark.range(rows).toDF("id")
      .withColumn("v", (col("id") * 7 % 1000).cast("long"))
      .withColumn("payload", sha2(col("id").cast("string"), 256))
      .repartitionByRange(nFiles, col("id"))
      .sortWithinPartitions("id")
    ManifestTable.append(spark, root, df)
    val total = ManifestTable.read(spark, root).inputFiles.length

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def agg(d: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = d.agg(count(lit(1)), sum("v")).collect()(0)
      (r.getLong(0), r.get(1).toString.toDouble)
    }

    case class Case(name: String, pred: org.apache.spark.sql.Column)
    val one = rows / nFiles
    val cases = Seq(
      Case("narrow range (1 file-width)", col("id") >= one * 3 && col("id") < one * 4),
      Case("quarter range", col("id") >= rows / 4 && col("id") < rows / 2),
      Case("two points (IN)", col("id").isin(42L, rows - 42L)),
      Case("untranslatable (pmod)", pmod(col("id"), lit(97)) === 0)
    )

    val lines = new scala.collection.mutable.ArrayBuffer[String]
    lines += "## Read-time data skipping"
    lines += ""
    lines += s"`SkippingProbe` — ${rows / 1000000}M rows, $total range-sorted files, local[$cpus]."
    lines += "Same filtered aggregate via `read().filter(pred)` (opens every live file)"
    lines += "vs `readWhere(pred)` (manifest-stats pruning before the reader):"
    lines += ""
    lines += "| predicate | files full | files readWhere | t full (s) | t readWhere (s) | rows |"
    lines += "|---|---|---|---|---|---|"
    cases.foreach { c =>
      // warm both paths once so neither measurement pays first-touch costs
      agg(ManifestTable.read(spark, root).filter(c.pred))
      agg(ManifestTable.readWhere(spark, root, c.pred))
      val ((nFull, _), tFull) = timed(agg(ManifestTable.read(spark, root).filter(c.pred)))
      val opened = ManifestTable.readCandidates(spark, root, c.pred).length
      val ((nSkip, sumSkip), tSkip) = timed(agg(ManifestTable.readWhere(spark, root, c.pred)))
      require(nFull == nSkip, s"${c.name}: row mismatch $nFull vs $nSkip")
      val ((nCheck, sumCheck), _) = timed(agg(ManifestTable.read(spark, root).filter(c.pred)))
      require(nCheck == nSkip && sumCheck == sumSkip, s"${c.name}: aggregate mismatch")
      val row = f"| ${c.name} | $total | $opened | $tFull%.2f | $tSkip%.2f | $nSkip |"
      lines += row
      println(row)
    }
    lines += ""
    lines += "The untranslatable shape degrades soundly (opens everything, same answer)."
    val section = lines.mkString("\n") + "\n"

    val f = new java.io.File("SCALE.md")
    if (f.exists()) {
      val prev = scala.io.Source.fromFile(f, "UTF-8").mkString
      val start = prev.indexOf("## Read-time data skipping")
      val baseDoc =
        if (start < 0) prev
        else {
          val next = prev.indexOf("\n## ", start + 1)
          if (next < 0) prev.substring(0, start) else prev.substring(0, start) + prev.substring(next + 1)
        }
      val out = new java.io.PrintWriter(f, "UTF-8")
      try out.print(baseDoc.stripSuffix("\n") + "\n\n" + section) finally out.close()
      println("updated SCALE.md read-skipping section")
    } else println("SCALE.md absent — printed only")
    spark.stop()
  }
}
