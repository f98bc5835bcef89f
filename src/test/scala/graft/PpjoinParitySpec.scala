package graft

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** r20: the PPJoin candidate join was rewritten — the probe side now
  * explodes only the shorter ALL-PAIRS indexing prefix
  * (n − ⌈2τ/(1+τ)·n⌉ + 1, Bayardo et al. WWW'07) with pairs oriented
  * smaller-set-probes (ties by id), while the index side keeps the full
  * prefix. The rewrite must be INVISIBLE in the output: ppjoin shares
  * the jaccard oracle SQL, so its pairs must equal the posting-form
  * plan's EXACTLY at both board thresholds — on the plain corpus and on
  * a corpus where every doc has an exact duplicate (group expansion and
  * the within-group arm exercise different code paths). */
class PpjoinParitySpec extends SparkSpec {

  private val Shift = 100000L

  private lazy val dupDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ppjoinsf").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + Shift))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("a").cast("long"), col("b").cast("long"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted

  Seq(0.2, 0.7).foreach { tau =>
    test(s"ppjoin indexing-prefix rewrite matches the posting-form jaccard plan at tau=$tau") {
      val t = Tables(spark, sf0001)
      val pp = rows(Dedup.ngramPpjoinAt(t, tau))
      val ref = rows(Dedup.ngramJaccardAt(t, tau))
      assert(pp === ref, s"ppjoin diverged from the posting-form plan at tau=$tau")
      if (tau <= 0.2) assert(pp.nonEmpty, "parity corpus produced no pairs — vacuous test")
    }

    test(s"ppjoin rewrite parity holds on the duplicated corpus at tau=$tau") {
      val t = Tables(spark, dupDir)
      val pp = rows(Dedup.ngramPpjoinAt(t, tau))
      val ref = rows(Dedup.ngramJaccardAt(t, tau))
      assert(pp === ref, s"ppjoin diverged on the duplicated corpus at tau=$tau")
      assert(pp.nonEmpty, "duplicated corpus must produce pairs")
    }
  }
}
