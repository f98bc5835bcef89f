package graft

import graft.operators.Dedup
import graft.sources.{ManifestTable, Tables}
import org.apache.spark.sql.functions._

/** `stream_dedup_incremental` cost attribution (r18 — the r17
  * verdict's #6): the key's 14.3 s isolated cost is two checkpointed
  * `Trigger.AvailableNow` JVM stream runs plus a 64-pbkt-partition
  * index bootstrap at fixture scale — this probe splits the bill so
  * the adjudication stops being a guess:
  *
  *   - `src append`       — publishing the crawl table the stream reads
  *   - `direct bootstrap` — `incrementalWriter` called as a plain
  *                          function on the corpus (sigs + within-batch
  *                          cands + the 64-partition index write):
  *                          everything run 1 does MINUS stream machinery
  *   - `direct batch`     — same for the batch against the index
  *   - `stream run 1/2`   — the REAL checkpointed stream drains (fresh
  *                          index/checkpoint), so `run_i − direct_i` ≈
  *                          the stream scaffolding itself (offset log,
  *                          checkpoint commits, microbatch planner)
  *   - `index compute`    — the bootstrap's banded rows materialized
  *                          without writing (so write ≈ bootstrap − compute)
  *   - index data-file count, for the small-file attribution
  *
  * Writes the numbers SCALE.md's "stream_dedup_incremental cost"
  * section cites. */
object IncrementalStreamProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-incr-stream-probe", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)
    val corpus = t.documents.filter(col("doc_id") % 4 =!= 0).select("doc_id", "text")
    val seeded = corpus.filter(col("doc_id") % 20 === 1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val batch = t.documents.filter(col("doc_id") % 4 === 0).select("doc_id", "text")
      .union(seeded)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"| $label | ${(System.nanoTime() - t0) / 1e9}%.2f |")
      r
    }
    def scratch(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString + "/t"
    def dataFiles(root: String): Long = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try s.iterator().asScala
        .count(p => p.toString.endsWith(".parquet") && p.toString.contains("/data")).toLong
      finally s.close()
    }

    // WARM pass first (codegen/JIT dominate a session's first run)
    locally {
      val idx = scratch("isp_warm")
      Dedup.incrementalWriter(idx, "isp-warm")(corpus, 0L)
      Dedup.incrementalWriter(idx, "isp-warm")(batch, 1L)
    }

    println("| phase | s |")
    println("|---|---|")

    // bootstrap COMPUTE only: the banded rows the first batch writes
    timed("index compute (no write)") {
      Dedup.bandedIndexOf(Dedup.sigsAllOver(corpus))
        .repartition(col("pbkt")).sortWithinPartitions("bucket").count()
    }

    // direct function calls — run 1 and run 2's work without a stream
    val idxDirect = scratch("isp_direct")
    timed("direct bootstrap (writer fn on corpus)") {
      Dedup.incrementalWriter(idxDirect, "isp-direct")(corpus, 0L)
    }
    timed("direct batch (writer fn vs index)") {
      Dedup.incrementalWriter(idxDirect, "isp-direct")(batch, 1L)
    }
    println(s"# index data files after direct runs: ${dataFiles(idxDirect)}")

    // the REAL streaming lifecycle, fresh tables + checkpoint
    val src = scratch("isp_src")
    val idx = scratch("isp_idx")
    val ck = scratch("isp_ck")
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream
        .foreachBatch(Dedup.incrementalWriter(idx, "isp-stream"))
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(180000), "stream drain timed out") finally q.stop()
    }
    timed("src append (corpus commit)") { ManifestTable.append(spark, src, corpus) }
    timed("stream run 1 (snapshot -> bootstrap)") { drain() }
    timed("src append (batch commit)") { ManifestTable.append(spark, src, batch) }
    timed("stream run 2 (checkpoint resume -> batch)") { drain() }
    timed("verdict join (exact-arm read + localize)") {
      val inIdx = ManifestTable.read(spark, idx)
        .filter(col("band") === -1).select("doc_id").withColumn("survived", lit(1))
      corpus.select("doc_id").union(batch.select("doc_id"))
        .join(inIdx, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("survived"), lit(0)).as("survived"))
        .orderBy("doc_id").collect().length
    }
    println(s"# index data files after stream runs: ${dataFiles(idx)}")
    spark.stop()
  }
}
