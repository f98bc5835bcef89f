package graft.operators

import graft.QueryDef
import graft.functions.VectorOps
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column.
  *
  * Brute-force top-k is the exact baseline: a broadcast of the query
  * vector against a linear scan, merged per-partition by Spark's
  * TakeOrderedAndProject — no shuffle of the corpus, scales linearly and
  * embarrassingly with executors. The bucketed variant prunes the scan to
  * one sign-LSH bucket (IVF-style coarse quantization): at 100 TB the
  * bucket id becomes a partition key and the scan touches 1/2^bits of the
  * data.
  */
object Similarity {

  private val K = 10
  private val AnnBits = 4

  private def queryVec(t: Tables): DataFrame =
    t.embeddings.filter(col("vec_id") === 0).select(col("embedding").as("qv"))

  /** Exact cosine top-k for the fixed probe vector (vec_id = 0). */
  def topkExact(t: Tables): DataFrame =
    t.embeddings
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(queryVec(t)))
      .select(col("vec_id"), round(VectorOps.cosineBest(t.spark)(col("embedding"), col("qv")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(K)

  private val topkExactSql =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(list_cosine_similarity(embedding, qv), 4) AS cos_sim
       |FROM embeddings, q WHERE vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT $K""".stripMargin

  /** ANN top-k: scan restricted to the probe's sign-LSH bucket. */
  def annBuckets(t: Tables): DataFrame = {
    val e = t.embeddings
      .withColumn("bucket", VectorOps.signBucket(col("embedding"), AnnBits))
    val q = t.embeddings.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), VectorOps.signBucket(col("embedding"), AnnBits).as("qbucket"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .filter(col("bucket") === col("qbucket"))
      .select(col("vec_id"), round(VectorOps.cosineBest(t.spark)(col("embedding"), col("qv")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(K)
  }

  private val annBucketsSql =
    s"""WITH q AS (SELECT embedding AS qv, ${VectorOps.sqlSignBucket("embedding", AnnBits)} AS qbucket
       |           FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(list_cosine_similarity(embedding, qv), 4) AS cos_sim
       |FROM embeddings, q
       |WHERE vec_id <> 0 AND ${VectorOps.sqlSignBucket("embedding", AnnBits)} = qbucket
       |ORDER BY cos_sim DESC, vec_id LIMIT $K""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("sim_topk_exact", topkExact, Some(topkExactSql)),
    QueryDef("sim_ann_buckets", annBuckets, Some(annBucketsSql))
  )
}
