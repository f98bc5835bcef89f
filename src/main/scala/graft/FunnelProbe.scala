package graft

import graft.sources.Tables

/** Funnel cost vs corpus size, MEASURED (r17): the perplexity gate
  * added the round's one new scale surface — a corpus-sized scratch
  * CHECKPOINT of the per-doc stage verdicts (the cut that stops the
  * LM's multi-branch references from re-running the URL/quality/
  * dedup/LSH prefix). This probe runs the full 7-stage
  * `text_pipeline_funnel` cold at 1× (sf0.1) and 10× (the ScaleProbe
  * corpus) and reports wall seconds and per-1k-doc cost — the claim
  * is LINEAR (per-doc cost flat): every stage is row-local or
  * key-bucketed, the LM model side is reference-bounded, and the
  * checkpoint is one distributed parquet write. Writes the numbers
  * the SCALE.md "Funnel perplexity gate" section cites. */
object FunnelProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaled = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    val scaled100 = sys.env.getOrElse("SPARK_GRAFT_SCALE100_DIR", "/tmp/graft_funnel100")
    val spark = GraftSession.builder("graft-funnel-probe", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(new java.io.File(s"$scaled/documents.parquet").exists(),
      s"scaled corpus missing — run ScaleProbe first (builds $scaled)")
    // 100x corpus, DOCUMENTS ONLY (the funnel touches no other table):
    // ScaleProbe's recipe — shifted ids, a distinct ` ~c<i>` suffix per
    // copy so each source doc becomes a near-dup cluster, never a
    // trivial exact collapse. r18: the point that separates fixed
    // overhead from the linear regime (the r17 verdict's #4) — at 10x
    // per-doc cost still FELL 8x (job overhead dominated), so
    // linearity needs the MARGINAL per-doc cost between the two
    // largest scales.
    // the marker is keyed to the SOURCE corpus (review r18): a marker
    // from a different SPARK_GRAFT_SF_DIR must not silently serve a
    // stale 100x build, or the marginal-cost line would divide timings
    // from two different corpora
    val marker = new java.io.File(s"$scaled100/_SCALE_OK")
    val markerOk = marker.exists() &&
      java.nio.file.Files.readString(marker.toPath).trim == src
    if (!markerOk) {
      import org.apache.spark.sql.functions._
      val base = spark.read.parquet(s"$src/documents.parquet")
      val stride = 1L << 40
      (0 until 100).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * stride))
          .withColumn("text",
            if (i == 0) col("text") else concat(col("text"), lit(s" ~c$i")))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$scaled100/documents.parquet")
      java.nio.file.Files.writeString(marker.toPath, src)
    }

    def run(label: String, dir: String): (Long, Double) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      val t0 = System.nanoTime()
      val out = graft.operators.TextAnalysis.pipelineFunnel(Tables(spark, dir))
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val stages = out.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
      println(f"| $label | $docs%,d | $sec%.1f | ${sec * 1000 / docs}%.2f |")
      println(s"#   stages: $stages")
      (docs, sec)
    }
    // one untimed pass first: codegen/JIT dominate the session's first
    // funnel by ~2x (the Bench warmup rationale) — compare warm to warm
    graft.operators.TextAnalysis.pipelineFunnel(Tables(spark, src)).collect()
    println("| corpus | docs | funnel s (warm) | s per 1k docs |")
    println("|---|---|---|---|")
    val (d1, _) = run("1x", src)
    val (d10, s10) = run("10x", scaled)
    // the 10x dir is ScaleProbe's build and carries no source marker
    // (review r19): a stale build from a different SPARK_GRAFT_SF_DIR
    // would make the marginal-cost line divide timings from two
    // different corpora — the exact-count check refuses instead
    require(d10 == 10 * d1,
      s"$scaled holds $d10 docs, not 10x the source's $d1 — stale ScaleProbe build " +
        s"for a different corpus; re-run ScaleProbe against $src")
    val (d100, s100) = run("100x", scaled100)
    require(d100 == 100 * d1,
      s"$scaled100 holds $d100 docs, not 100x the source's $d1")
    // the linear-regime number: seconds per ADDED 1k docs between the
    // two largest scales — flat marginal cost = linear funnel
    println(f"# marginal cost 10x->100x: ${(s100 - s10) * 1000 / (d100 - d10)}%.3f s per 1k added docs")
    spark.stop()
  }
}
