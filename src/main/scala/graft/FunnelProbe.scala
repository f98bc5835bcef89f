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
    val spark = GraftSession.builder("graft-funnel-probe", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(new java.io.File(s"$scaled/documents.parquet").exists(),
      s"scaled corpus missing — run ScaleProbe first (builds $scaled)")

    def run(label: String, dir: String): Unit = {
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      val t0 = System.nanoTime()
      val out = graft.operators.TextAnalysis.pipelineFunnel(Tables(spark, dir))
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val stages = out.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
      println(f"| $label | $docs%,d | $sec%.1f | ${sec * 1000 / docs}%.2f |")
      println(s"#   stages: $stages")
    }
    // one untimed pass first: codegen/JIT dominate the session's first
    // funnel by ~2x (the Bench warmup rationale) — compare warm to warm
    graft.operators.TextAnalysis.pipelineFunnel(Tables(spark, src)).collect()
    println("| corpus | docs | funnel s (warm) | s per 1k docs |")
    println("|---|---|---|---|")
    run("1x", src)
    run("10x", scaled)
    spark.stop()
  }
}
