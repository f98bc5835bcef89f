package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the deequ `VerificationSuite`
  * capability (the reference ships deequ-2.0.3 in its jars and lists
  * "validate data, handle duplicated events" as its roadmap;
  * reference: README.md "Further actions" §2).
  *
  * A check suite compiles to ONE aggregation over the table (single scan,
  * map-side combined) plus one anti-join for referential integrity —
  * constant job count regardless of how many checks run, which is what
  * makes a 100 TB nightly audit affordable.
  */
object QualityChecks {

  /** Check report for `orders`: (check_name, violations, passed). */
  def ordersChecks(t: Tables): DataFrame = ordersChecksOn(t.orders, t.customer)

  /** Same suite over arbitrary frames (unit-testable with crafted data). */
  def ordersChecksOn(o: DataFrame, customer: DataFrame): DataFrame = {
    val scanChecks = o.agg(
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("not_null_custkey"),
      (count(lit(1)) - count_distinct(col("o_orderkey"))).as("unique_orderkey"),
      // NULL counts as a violation in every predicate check: three-valued
      // logic would otherwise let a NULL-ridden batch pass the gate
      sum(when(col("o_totalprice").isNull || col("o_totalprice") <= 0, 1L).otherwise(0L)).as("positive_totalprice"),
      sum(when(col("o_orderstatus").isNull || !col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("status_domain"),
      sum(when(col("o_orderdate").isNull || col("o_orderdate") < lit("1990-01-01").cast("timestamp") ||
        col("o_orderdate") >= lit("2010-01-01").cast("timestamp"), 1L).otherwise(0L)).as("orderdate_range")
    )
    val long = scanChecks.select(
      explode(array(
        Seq("not_null_custkey", "unique_orderkey", "positive_totalprice", "status_domain", "orderdate_range")
          // coalesce: sum() over ZERO rows is NULL — an empty batch must
          // read as an explicit pass, not a neither-pass-nor-fail NULL
          .map(n => struct(lit(n).as("check_name"), coalesce(col(n), lit(0L)).as("violations"))): _*)).as("c"))
      .select(col("c.*"))
    // referential integrity: every o_custkey resolves in customer. No
    // broadcast hint — customer is SF-scaled; AQE broadcasts it when the
    // runtime size fits, shuffles otherwise
    val ri = o
      .join(customer, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("ref_custkey_exists").as("check_name"), col("violations"))
    long.union(ri)
      .withColumn("passed", col("violations") === 0L)
      .orderBy("check_name")
  }

  private val ordersChecksSql =
    """SELECT check_name, coalesce(violations, 0) AS violations,
      |       coalesce(violations, 0) = 0 AS passed FROM (
  -- CAST AS BIGINT: DuckDB sum() over INTEGER yields HUGEINT, which the
  -- comparator's pandas fetch renders as float64 ('0.0' vs Spark's '0')
      |  SELECT 'not_null_custkey' AS check_name,
      |         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM orders
      |  UNION ALL
      |  SELECT 'unique_orderkey', count(*) - count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL
      |  SELECT 'positive_totalprice', CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'status_domain', CAST(sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'orderdate_range', CAST(sum(CASE WHEN o_orderdate IS NULL OR o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
      |                                       OR o_orderdate >= TIMESTAMP '2010-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'ref_custkey_exists', count(*) FROM orders
      |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
      |ORDER BY check_name""".stripMargin

  /** Check report for `documents` — the consistency gate a text corpus
    * passes before entering a training pipeline. */
  def documentsChecks(t: Tables): DataFrame =
    t.documents.agg(
      sum(when(col("text").isNull || length(col("text")) === 0, 1L).otherwise(0L)).as("non_empty_text"),
      sum(when(!(col("n_chars") <=> length(col("text"))), 1L).otherwise(0L)).as("n_chars_consistent"),
      sum(when(col("lang").isNull || !col("lang").isin("en", "es", "de", "fr", "zh"), 1L).otherwise(0L)).as("lang_domain"),
      (count(lit(1)) - count_distinct(col("doc_id"))).as("unique_doc_id")
    ).select(
      explode(array(
        Seq("non_empty_text", "n_chars_consistent", "lang_domain", "unique_doc_id")
          .map(n => struct(lit(n).as("check_name"), coalesce(col(n), lit(0L)).as("violations"))): _*)).as("c"))
      .select(col("c.*"))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("check_name")

  private val documentsChecksSql =
    """SELECT check_name, coalesce(violations, 0) AS violations,
      |       coalesce(violations, 0) = 0 AS passed FROM (
      |  SELECT 'non_empty_text' AS check_name,
      |         CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM documents
      |  UNION ALL
      |  SELECT 'n_chars_consistent', CAST(sum(CASE WHEN n_chars IS DISTINCT FROM length(text) THEN 1 ELSE 0 END) AS BIGINT) FROM documents
      |  UNION ALL
      |  SELECT 'lang_domain', CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN ('en','es','de','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) FROM documents
      |  UNION ALL
      |  SELECT 'unique_doc_id', count(*) - count(DISTINCT doc_id) FROM documents)
      |ORDER BY check_name""".stripMargin

  /** Check report for `embeddings` — the vector-store gate before any
    * ANN index build: fixed dimensionality, no null/NaN components, no
    * zero vectors (cosine undefined), unique ids, label domain. Same
    * one-scan shape: the array checks fold per-row via higher-order
    * functions, then a single aggregate. */
  /** Expected dimensionality, shared with the ANN oracles' unrolling. */
  private val Dim = Similarity.EmbeddingDim

  def embeddingsChecks(t: Tables): DataFrame =
    t.embeddings.agg(
      sum(when(col("embedding").isNull || size(col("embedding")) =!= Dim, 1L).otherwise(0L))
        .as(s"dim_is_$Dim"),
      sum(when(exists(col("embedding"), e => e.isNull || isnan(e)), 1L).otherwise(0L))
        .as("no_null_nan_components"),
      // zero vector ⇔ non-empty, fully non-null, max |e| = 0 — the
      // emptiness/null guards keep both engines' folds in agreement
      // (DuckDB list_max is NULL on empty/all-NULL lists; Spark's
      // aggregate() would report its 0.0 seed)
      sum(when(col("embedding").isNotNull && size(col("embedding")) > 0 &&
          !exists(col("embedding"), e => e.isNull) &&
          aggregate(col("embedding"), lit(0.0d), (acc, e) => greatest(acc, abs(e.cast("double")))) === 0.0d,
        1L).otherwise(0L)).as("no_zero_vectors"),
      (count(lit(1)) - count_distinct(col("vec_id"))).as("unique_vec_id"),
      sum(when(col("label").isNull || col("label") < 0 || col("label") > 9, 1L).otherwise(0L))
        .as("label_domain")
    ).select(
      explode(array(
        Seq(s"dim_is_$Dim", "no_null_nan_components", "no_zero_vectors", "unique_vec_id", "label_domain")
          .map(n => struct(lit(n).as("check_name"), coalesce(col(n), lit(0L)).as("violations"))): _*)).as("c"))
      .select(col("c.*"))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("check_name")

  private val embeddingsChecksSql =
    s"""SELECT check_name, coalesce(violations, 0) AS violations,
      |       coalesce(violations, 0) = 0 AS passed FROM (
      |  SELECT 'dim_is_$Dim' AS check_name,
      |         CAST(sum(CASE WHEN embedding IS NULL OR len(embedding) <> $Dim THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM embeddings
      |  UNION ALL
      |  SELECT 'no_null_nan_components',
      |         CAST(sum(CASE WHEN list_bool_or(list_transform(embedding, e -> e IS NULL OR isnan(e))) THEN 1 ELSE 0 END) AS BIGINT) FROM embeddings
      |  UNION ALL
      |  SELECT 'no_zero_vectors',
      |         CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) > 0
      |                        AND NOT coalesce(list_bool_or(list_transform(embedding, e -> e IS NULL)), FALSE)
      |                        AND list_max(list_transform(embedding, e -> abs(CAST(e AS DOUBLE)))) = 0.0
      |                   THEN 1 ELSE 0 END) AS BIGINT) FROM embeddings
      |  UNION ALL
      |  SELECT 'unique_vec_id', count(*) - count(DISTINCT vec_id) FROM embeddings
      |  UNION ALL
      |  SELECT 'label_domain', CAST(sum(CASE WHEN label IS NULL OR label < 0 OR label > 9 THEN 1 ELSE 0 END) AS BIGINT) FROM embeddings)
      |ORDER BY check_name""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("quality_orders", ordersChecks, Some(ordersChecksSql)),
    QueryDef("quality_documents", documentsChecks, Some(documentsChecksSql)),
    QueryDef("quality_embeddings", embeddingsChecks, Some(embeddingsChecksSql))
  )
}
