package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer must plan discarded-rank `row_number() <= k` filters as
  * TopKPerKey, and must NOT touch shapes with different semantics. */
class TopKRewriteSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
  private def w = Window.partitionBy("o_orderpriority")
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  private def nodes(df: DataFrame): Seq[String] =
    df.queryExecution.explainString(FormattedMode).linesIterator.collect {
      case l if l.matches("""^\(\d+\) .*""") => l.replaceAll("""^\(\d+\) """, "").trim
    }.toSeq

  test("row_number <= k with discarded rank rewrites to TopKPerKey, same rows") {
    val q = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "o_orderkey") // rank dropped
    val planNodes = nodes(q)
    assert(planNodes.exists(_.startsWith("TopKPerKey")), planNodes.mkString("; "))
    assert(!planNodes.exists(_.startsWith("Window")), planNodes.mkString("; "))
    // rows must match the un-rewritten formulation (recomputed via rank kept)
    val reference = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3).select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet == reference)
  }

  test("rnk = 1 (CDC latest-wins shape) rewrites: etl_upsert_latest plans on the heap") {
    val q = graft.operators.Etl.upsertLatest(Tables(spark, sf0001))
    val planNodes = nodes(q)
    assert(planNodes.exists(_.startsWith("TopKPerKey")), planNodes.mkString("; "))
    assert(!planNodes.exists(_.startsWith("Window")), planNodes.mkString("; "))
  }

  test("strict rnk < k rewrites with k-1 (boundary semantics preserved)") {
    val strict = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") < 4) // = top 3
      .select("o_orderpriority", "o_orderkey")
    assert(nodes(strict).exists(_.startsWith("TopKPerKey")))
    val viaLte = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3).select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(strict.collect().map(r => (r.getString(0), r.getLong(1))).toSet == viaLte)
  }

  test("spark.graft.topkRewrite.enabled=false keeps the window plan") {
    spark.conf.set(graft.plans.TopKRewriteRule.EnabledKey, "false")
    try {
      val q = orders.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3).select("o_orderpriority", "o_orderkey")
      val planNodes = nodes(q)
      assert(!planNodes.exists(_.startsWith("TopKPerKey")), planNodes.mkString("; "))
      assert(planNodes.exists(_.startsWith("Window")), planNodes.mkString("; "))
    } finally spark.conf.unset(graft.plans.TopKRewriteRule.EnabledKey)
  }

  test("no rewrite when the rank column is returned") {
    val q = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "o_orderkey", "rnk")
    assert(!nodes(q).exists(_.startsWith("TopKPerKey")))
  }

  test("no rewrite for rank(): ties have different semantics") {
    val q = orders.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "o_orderkey")
    assert(!nodes(q).exists(_.startsWith("TopKPerKey")))
  }

  test("no rewrite for compound filters") {
    val q = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3 && col("o_orderkey") > 100)
      .select("o_orderpriority", "o_orderkey")
    assert(!nodes(q).exists(_.startsWith("TopKPerKey")))
  }
}
