package graft

import graft.sources.Tables

/** r20 measurement probe for the PPJoin candidate-join rewrite (the r19
  * verdict's #1): prints, per τ, the probe-side prefix-row volume, the
  * matched row volume and the candidate-pair count of the r19 plan
  * (full symmetric probe prefix + per-row positional filter + distinct)
  * next to the SHIPPED r20 plan (asymmetric indexing probe prefix,
  * Bayardo et al. WWW'07, same per-row positional filter + distinct)
  * and the REJECTED r20b exploration (true accumulated-overlap ∀k
  * check, Xiao et al. WWW'08 §3.2 — prunes ~1% more pairs but ships
  * 29-86% more match rows into a pair aggregate) over the SAME shingle
  * relation, plus the true pair count from exact verification of each
  * candidate set — equal true counts are the losslessness check, the
  * probe/matched columns are the claimed pruning evidence.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PpjoinProbe"
  */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-ppjoin-probe", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    println("tau\tvariant\tprobe_rows\tmatched_rows\tcand_pairs\ttrue_pairs")
    Seq(0.2, 0.7).foreach { tau =>
      val s = graft.operators.Dedup.ppjoinProbeStats(t, tau)
      println(s"$tau\tr19\t${s("full_prefix_rows")}\t${s("r19_matched_rows")}\t${s("r19_cand_pairs")}\t${s("true_pairs")}")
      println(s"$tau\tr20\t${s("probe_prefix_rows")}\t${s("r20_matched_rows")}\t${s("r20_cand_pairs")}\t${s("r20_true_pairs")}")
      println(s"$tau\tr20b\t${s("probe_prefix_rows")}\t${s("r20b_matched_rows")}\t${s("r20b_cand_pairs")}\t${s("r20b_true_pairs")}")
      require(s("true_pairs") == s("r20_true_pairs") && s("true_pairs") == s("r20b_true_pairs"),
        s"LOSSY candidate rewrite at tau=$tau: " +
          s"${s("true_pairs")} true pairs from r19 candidates vs " +
          s"${s("r20_true_pairs")} (r20) / ${s("r20b_true_pairs")} (r20b)")
    }
    spark.stop()
  }
}
