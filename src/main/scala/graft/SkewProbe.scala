package graft

import graft.functions.Hashing
import graft.sources.{ManifestTable, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Skew robustness probe — the 100 TB brief's main untested risk: the
  * sf testdata is uniform-ish, so this probe INJECTS power-law keys into
  * the three shapes where skew decides cluster behavior and measures
  * what actually happens (wall, spill, peak task memory, slowest task):
  *
  *   1. MERGE under a power-law change stream (`etl_merge_upsert` shape):
  *      one hot key carrying ~20% of a 2M-event batch. The `latestBy`
  *      collapse meets the skew FIRST, and hash-aggregate partial
  *      combine absorbs it map-side; after the collapse both join sides
  *      are key-unique, so the merge join is structurally skew-free.
  *   2. Posting-form n-gram Jaccard (`dedup_ngram_jaccard`) on a
  *      boilerplate-heavy corpus: 30% of documents share an identical
  *      prefix, so its shingles' document frequency explodes — and the
  *      df-cap (stop-shingle exclusion, df ≤ 1000) drops exactly those
  *      postings, bounding pair volume by construction.
  *   3. A plain large join with one hot key — the shape that genuinely
  *      NEEDS runtime help — A/B'd with AQE skew-join splitting on/off,
  *      recording whether the split fires (slowest-task wall collapses).
  *
  * Usage: `sbt "runMain graft.SkewProbe"`; env knobs `SPARK_GRAFT_CPUS`,
  * `SPARK_GRAFT_SKEW_EVENTS` (default 2,000,000), `SPARK_GRAFT_SKEW_DOCS`
  * (default 50,000 ≈ the 10× corpus). Writes the "## Skew robustness"
  * section of SCALE.md.
  */
object SkewProbe {

  /** Per-run task metrics incl. the slowest task — the skew signal. */
  private final class TaskAcc extends SparkListener {
    val spillMem, spillDisk, peakMem, maxTaskMs = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
        peakMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        maxTaskMs.getAndUpdate(p => math.max(p, m.executorRunTime))
      }
    }
    def reset(): Unit = Seq(spillMem, spillDisk, peakMem, maxTaskMs).foreach(_.set(0))
  }

  private case class Meas(sec: Double, spillGb: Double, peakMb: Long, maxTaskS: Double,
      rows: Long)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_SKEW_EVENTS", "2000000").toLong
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SKEW_DOCS", "50000").toLong
    val spark = GraftSession.builder("graft-skew-probe", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new TaskAcc
    spark.sparkContext.addSparkListener(acc)

    def measure(rows: => Long): Meas = {
      acc.reset()
      val t0 = System.nanoTime()
      val n = rows
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.waitListenerBusEmpty(spark.sparkContext)
      Meas(sec, (acc.spillMem.get + acc.spillDisk.get) / 1e9,
        acc.peakMem.get / (1 << 20), acc.maxTaskMs.get / 1e3, n)
    }

    val base = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val keySpace = 1000000L

    // ---- 1. MERGE under power-law vs uniform change batches -----------
    // hot batch: ~20% of events hit key 0; uniform batch: md5-scattered
    def batch(hot: Boolean) = {
      val uniformKey = pmod(Hashing.md5Long(col("id"), 3), lit(keySpace))
      spark.range(nEvents).select(
        (if (hot) when(pmod(Hashing.md5Long(col("id"), 5), lit(5)) === 0, lit(0L))
          .otherwise(uniformKey)
         else uniformKey).as("user_id"),
        col("id").as("ts"),
        pmod(Hashing.md5Long(col("id"), 7), lit(1000)).as("score"))
    }
    // the writer's latestBy collapse dedupes the batch the way any CDC
    // consumer must before a keyed merge — the skew hits the collapse
    def mergeCollapsedRun(tag: String, hot: Boolean): Meas = {
      val root = s"$base/mergec_$tag"
      ManifestTable.append(spark, root,
        spark.range(keySpace).select(col("id").as("user_id"), lit(-1L).as("ts"),
          lit(0L).as("score")))
      val writer = ManifestTable.exactlyOnceMergeWriter(root, Seq("user_id"),
        "skew-probe", latestBy = Some("ts"))
      measure { writer(batch(hot), 1L); ManifestTable.read(spark, root).count() }
    }
    val mergeUni = mergeCollapsedRun("uni", hot = false)
    val mergeHot = mergeCollapsedRun("hot", hot = true)

    // ---- 2. Jaccard on a boilerplate-heavy vs uniform corpus ----------
    // ~300-char docs like the sf corpus; in the skewed variant 30% of
    // docs open with an IDENTICAL 160-char boilerplate block
    def corpus(dir: String, boilerplate: Boolean): Tables = {
      // ~1% of docs clone their predecessor's text so both corpora carry
      // a real near-dup baseline (seed drives the word stream, not id)
      val seed = when(pmod(Hashing.md5Long(col("id"), 17), lit(100)) === 7,
        col("id") - 1).otherwise(col("id"))
      def words(salt: Int, n: Int) = concat_ws(" ", (0 until n).map(i =>
        concat(lit("w"), pmod(Hashing.md5Long(seed, salt * 100 + i), lit(5000)))): _*)
      val bp = (0 until 20).map(i => s"boiler$i").mkString(" ")
      val text = if (boilerplate)
        when(pmod(Hashing.md5Long(seed, 11), lit(10)) < 3,
          concat(lit(bp + " "), words(2, 15))).otherwise(words(1, 40))
      else words(1, 40)
      spark.range(nDocs).select(col("id").as("doc_id"), text.as("text"),
        lit("en").as("lang"), concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      Tables(spark, dir)
    }
    val jacUniT = corpus(s"$base/docs_uni", boilerplate = false)
    val jacHotT = corpus(s"$base/docs_hot", boilerplate = true)
    val jacUni = measure(operators.Dedup.ngramJaccard(jacUniT).count())
    val jacHot = measure(operators.Dedup.ngramJaccard(jacHotT).count())

    // ---- 3. Hot-key sort-merge join: AQE skew split A/B ---------------
    // left: 20% of rows on key 0; right: key-unique dim too wide to
    // broadcast. The skewed partition is ~40 MB, so the demo lowers the
    // split threshold (the documented knob) to let AQE act at probe scale.
    def skewJoinRun(split: Boolean): Meas = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", split.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // 4× the merge batch: the hot partition must dwarf a task so the
        // OFF run shows the straggler the split exists to kill
        val left = spark.range(nEvents * 4).select(
          when(pmod(Hashing.md5Long(col("id"), 5), lit(5)) === 0, lit(0L))
            .otherwise(pmod(Hashing.md5Long(col("id"), 3), lit(keySpace))).as("k"),
          pmod(Hashing.md5Long(col("id"), 9), lit(1000)).as("v")) // bounded: sum cannot overflow
        val right = spark.range(keySpace).select(col("id").as("k"),
          concat(lit("dim-"), col("id")).as("name"))
        measure {
          left.join(right, "k").agg(count(lit(1)), sum(col("v"))).collect(); nEvents * 4
        }
      } finally {
        Seq("spark.sql.adaptive.skewJoin.enabled",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "spark.sql.autoBroadcastJoinThreshold").foreach(spark.conf.unset)
      }
    }
    val joinOff = skewJoinRun(split = false)
    val joinOn = skewJoinRun(split = true)

    def row(name: String, m: Meas) =
      f"| $name | ${m.sec}%.1f | ${m.spillGb}%.2f | ${m.peakMb} | ${m.maxTaskS}%.1f | ${m.rows}%,d |"
    val section =
      f"""## Skew robustness
         |
         |Generated by `sbt "runMain graft.SkewProbe"`: power-law keys injected
         |into the three skew-deciding shapes at `local[$cpus]` — ${nEvents}%,d-event
         |merge batches over ${keySpace}%,d keys (hot = ~20%% of events on ONE key),
         |a ${nDocs}%,d-doc corpus (skewed = 30%% of docs share an identical
         |boilerplate block), and a hot-key sort-merge join (4× the
         |events) A/B'd with AQE skew-join splitting. `max task` is the slowest task's executor time —
         |the straggler that sets stage wall-clock on a real cluster.
         |
         || run | sec | spill GB | peak task MB | max task s | rows |
         ||---|---|---|---|---|---|
         |${row("merge, uniform batch", mergeUni)}
         |${row("merge, hot-key batch", mergeHot)}
         |${row("jaccard, uniform corpus", jacUni)}
         |${row("jaccard, boilerplate corpus", jacHot)}
         |${row("hot join, skew split OFF", joinOff)}
         |${row("hot join, skew split ON", joinOn)}
         |
         |Readings. (1) The merge pipeline meets the power law at the `latestBy`
         |collapse, where hash-aggregate partial combine reduces the hot key
         |map-side; post-collapse both merge join sides are key-unique, so the
         |join itself cannot skew. The hot batch can even come out FASTER:
         |20%% of its events collapse into one surviving row, so fewer
         |distinct keys reach the merge and fewer files rewrite. (2) Boilerplate shingles blow past the df-cap and
         |are EXCLUDED from postings (stop-shingle semantics), so the skewed
         |corpus generates no hot posting lists — pair volume stays bounded by
         |Σ C(min(df,cap), 2). (3) The plain hot join is where AQE has to act:
         |with splitting off, one task drags the whole stage; with it on, the
         |skewed partition splits and the slowest task collapses toward the
         |median. At cluster scale the same mechanism works per executor; the
         |salting alternative for joins AQE cannot split is `q_skew_salted`
         |(operators/Analytics.scala).
         |""".stripMargin
    println(section)

    val f = new java.io.File("SCALE.md")
    if (f.exists()) {
      val prev = scala.io.Source.fromFile(f, "UTF-8").mkString
      val start = prev.indexOf("## Skew robustness")
      val baseDoc =
        if (start < 0) prev
        else {
          val next = prev.indexOf("\n## ", start + 1)
          if (next < 0) prev.substring(0, start) else prev.substring(0, start) + prev.substring(next + 1)
        }
      val out = new java.io.PrintWriter(f, "UTF-8")
      try out.print(baseDoc.stripSuffix("\n") + "\n\n" + section) finally out.close()
      println("updated SCALE.md skew section")
    } else println("SCALE.md absent — printed only")
    spark.stop()
  }
}
