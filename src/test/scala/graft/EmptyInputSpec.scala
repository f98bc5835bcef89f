package graft

import graft.sources.Tables
import org.apache.spark.sql.SaveMode

/** Operators must degrade to empty results — not crash — when a filter or
  * partition pruning leaves zero input rows (routine at 100 TB). */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("emptysf").toString
    val t = Tables(spark, sf0001)
    // write zero-row copies, preserving each schema
    Seq("documents", "embeddings", "events", "orders", "customer", "lineitem",
      "nation", "region", "supplier", "part").foreach { name =>
      val src = name match {
        case "events" => t.events // ns→µs converted schema
        case other    => spark.read.parquet(s"$sf0001/$other.parquet")
      }
      src.limit(0).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name.parquet")
    }
    dir
  }

  Seq(
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding", "dedup_clusters", "sim_topk_exact", "sim_ann_buckets",
    "sim_ivf_topk", "sim_ivfpq", "emb_centroids", "emb_knn_label", "text_tfidf",
    "text_quality", "etl_upsert_latest", "q1_pricing_summary", "q_top_customers",
    "dedup_contamination_bloom", "etl_scd2_user_state", "etl_zorder_key",
    "q_trailing_window", "stream_interval_join",
    "text_dedup_lines", "q2_min_cost_supplier", "q11_national_part_value",
    "q16_supplier_counts", "q20_dominant_suppliers",
    "etl_dsir_weights", "etl_dsir_sample",
    "dedup_substring", "dedup_substring_cut", "dedup_substring_keepfirst",
    "text_bpe_tokens", "etl_mix_weights_bpe", "etl_pack_sequences_bpe"
  ).foreach { name =>
    test(s"$name returns empty (not error) on zero-row tables") {
      assert(SparkEntry.queries(name)(spark, emptyDir).count() == 0)
    }
  }
}
