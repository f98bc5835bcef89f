package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The pairwise dedup operators pre-collapse exact-duplicate texts to
  * group representatives and expand results back to members — an
  * optimization that must be INVISIBLE in the output. The sf0.01
  * correctness-gate corpus happens to contain no exact-dup texts, so a
  * missing expansion passes it silently (a real bug class: caught once
  * in review for the estimator audit). This spec runs the pairwise
  * operators on a corpus where EVERY doc has an exact duplicate and
  * asserts the member-closure property directly, no oracle needed:
  * if (a,b) is a pair and a' duplicates a, then (a',b), (a,b'), (a',b')
  * and (a,a') must all be pairs too. */
class DupClosureSpec extends SparkSpec {

  private val Shift = 100000L

  private lazy val dupDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("dupsf").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + Shift))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    // the dedup family only reads documents; other tables pass through
    Seq("embeddings", "events", "orders", "customer", "lineitem",
      "nation", "region", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$sf0001/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    }
    dir
  }

  Seq("dedup_ngram_jaccard", "dedup_ngram_ppjoin", "dedup_ngram_ppjoin_hi",
    "dedup_minhash_lsh", "dedup_minhash_est", "dedup_simhash").foreach { q =>
    test(s"$q output is closed under exact duplication of every doc") {
      val res = SparkEntry.queries(q)(spark, dupDir)
        .select(col("a").cast("long"), col("b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def ordered(x: Long, y: Long) = (math.min(x, y), math.max(x, y))
      val base = res.filter { case (a, b) => a < Shift && b < Shift && a + Shift != b }
      assert(base.nonEmpty, s"$q found no base pairs on the duplicated corpus")
      base.foreach { case (a, b) =>
        Seq(ordered(a + Shift, b), ordered(a, b + Shift), ordered(a + Shift, b + Shift),
          ordered(a, a + Shift), ordered(b, b + Shift)).foreach { p =>
          assert(res.contains(p), s"$q: pair ($a,$b) exists but member image $p is missing")
        }
      }
    }
  }
}
