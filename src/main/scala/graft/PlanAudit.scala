package graft
import org.apache.spark.sql.SparkSession
/** Prints formatted plans for representative queries — pushdown/broadcast audit. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary", "q3_shipping_priority", "sim_topk_exact")
    names.foreach { n =>
      // eager keys return a localized frame (plan: LocalRelation) — their
      // corpus-scale plans are the STAGE frames (r18 seam); print those
      if (SparkEntry.stagedKeys.contains(n))
        SparkEntry.explainStages(n, spark, dir) { (stage, df) =>
          println(s"========== $n#$stage ==========")
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
      else {
        println(s"========== $n ==========")
        println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
