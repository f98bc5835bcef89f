package graft
import org.apache.spark.sql.SparkSession
/** Scale probe: dedup suite against a 10x-duplicated corpus (50k docs,
  * heavy duplicate structure — the adversarial case for pair blowup). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/docs10x")
    for (name <- Seq("dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard", "text_tfidf")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"$name: $n rows in ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
