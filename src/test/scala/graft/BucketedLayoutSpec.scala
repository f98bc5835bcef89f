package graft

import graft.sources.{BucketedLayout, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class BucketedLayoutSpec extends SparkSpec {

  /** Count shuffle exchanges in the FINAL (post-AQE) physical plan. */
  private def shuffleCount(df: DataFrame): Int = {
    df.count() // materialize so AQE settles on the final plan
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    def count(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _                      => 0
      }
      val viaStage = p match {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => count(s.plan)
        case _                                                         => 0
      }
      self + viaStage + p.children.map(count).sum
    }
    count(unwrap(df.queryExecution.executedPlan))
  }

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val t = Tables(spark, sf0001)
    Seq("b_orders", "b_lineitem").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    BucketedLayout.writeBucketed(t.orders, "b_orders", "o_orderkey", 4)
    BucketedLayout.writeBucketed(
      t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 4)
    val joined = BucketedLayout.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    assert(joined.count() == 6000)
    assert(shuffleCount(joined) == 0, "bucketed join must not shuffle either side")

    // control: the same merge join over plain parquet shuffles both sides
    val plain = t.orders.hint("merge").join(
      t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey").hint("merge"), "o_orderkey")
    assert(shuffleCount(plain) >= 2)
  }
}
