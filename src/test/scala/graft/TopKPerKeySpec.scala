package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select("o_orderpriority", "o_orderkey", "o_totalprice")

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("matches the window-rank formulation row for row") {
    val native = TopKPerKey(orders, Seq("o_orderpriority"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3).drop("rnk")
    assert(collectPairs(native) == collectPairs(viaWindow))
    assert(native.count() == viaWindow.count())
  }

  test("k exceeding every group size returns the full input") {
    val native = TopKPerKey(orders, Seq("o_orderpriority"),
      Seq(("o_orderkey", true)), Int.MaxValue)
    assert(native.count() == orders.count())
  }

  test("result is partitioning-invariant (partial phase prunes correctly)") {
    val base = TopKPerKey(orders, Seq("o_orderpriority"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 5)
    val skewed = TopKPerKey(orders.repartition(7), Seq("o_orderpriority"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 5)
    assert(collectPairs(base) == collectPairs(skewed))
  }

  test("plans as two heap phases around one exchange — no sort, no window") {
    val native = TopKPerKey(orders, Seq("o_orderpriority"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val text = native.queryExecution.explainString(FormattedMode)
    val nodes = text.linesIterator.collect {
      case l if l.matches("""^\(\d+\) .*""") => l.replaceAll("""^\(\d+\) """, "").trim
    }.toSeq
    assert(nodes.count(_.startsWith("TopKPerKey")) == 2, nodes.mkString("; "))
    assert(nodes.count(_ == "Exchange") == 1, nodes.mkString("; "))
    assert(!nodes.exists(n => n.startsWith("Sort") || n.startsWith("Window")), nodes.mkString("; "))
  }

  test("SparkEntry.prepare plants the planner strategy idempotently") {
    assert(SparkEntry.queries("q_topk_native")(spark, sf0001).count() == 15)
    SparkEntry.queries("q_topk_native")(spark, sf0001).count()
    assert(spark.experimental.extraStrategies.count(_ == graft.plans.TopKPerKeyStrategy) == 1)
  }

  test("state cap fails fast naming the rewrite opt-out, not an OOM") {
    spark.conf.set(graft.plans.TopKPerKeyExec.MaxStateEntriesKey, "10")
    try {
      val native = TopKPerKey(orders.coalesce(1), Seq("o_orderkey"), // every key distinct
        Seq(("o_totalprice", false)), 1)
      val e = intercept[org.apache.spark.SparkException] { native.count() }
      val msg = e.getCause match { case null => e.getMessage; case c => c.getMessage }
      assert(msg.contains(graft.plans.TopKPerKeyExec.MaxStateEntriesKey), msg)
      assert(msg.contains("spark.graft.topkRewrite.enabled"), msg)
    } finally spark.conf.unset(graft.plans.TopKPerKeyExec.MaxStateEntriesKey)
  }

  test("state cap counts kept rows, not input rows: bounded groups pass") {
    // 5 priorities × k=2 = 10 kept entries per task — exactly at a cap of 10,
    // while input rows per task far exceed it
    spark.conf.set(graft.plans.TopKPerKeyExec.MaxStateEntriesKey, "10")
    try {
      val native = TopKPerKey(orders.coalesce(1), Seq("o_orderpriority"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
      assert(native.count() == 10)
    } finally spark.conf.unset(graft.plans.TopKPerKeyExec.MaxStateEntriesKey)
  }

  test("rejects unknown columns and non-positive k") {
    intercept[IllegalArgumentException] {
      TopKPerKey(orders, Seq("nope"), Seq(("o_orderkey", true)), 3)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey(orders, Seq("o_orderpriority"), Seq(("o_orderkey", true)), 0)
    }
  }
}
