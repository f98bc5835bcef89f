package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator engine extension: per-key top-k without sorting.
  *
  * Spark expresses "top k rows per key" as window-rank-then-filter, which
  * SORTS every key group in full — at 100 TB that is a giant sort whose
  * output is immediately 99.99% discarded. This operator keeps a bounded
  * heap per key instead, in two phases mirroring partial aggregation:
  * a PARTIAL pass prunes each input partition to ≤ k rows per key before
  * the exchange (the map-side combine), then a FINAL pass merges after a
  * hash shuffle on the keys. Work is O(n log k) with O(keys_per_partition
  * × k) state, and the shuffle carries at most partitions × k rows per
  * key instead of everything.
  *
  * The full custom-operator stack per the Spark extension points: a
  * [[TopKPerKey logical node]], a [[TopKPerKeyStrategy planner strategy]]
  * (injected via `SparkSessionExtensions.injectPlannerStrategy`), and a
  * [[TopKPerKeyExec physical operator]] whose required child distribution
  * lets `EnsureRequirements` place the exchange. Oracle-verified against
  * the `row_number() OVER (...)` formulation by `q_topk_native`.
  *
  * MEMORY ENVELOPE: each task holds (distinct keys in its partition) × k
  * row copies plus hash-map overhead — the same unspilled-map-side shape
  * as a hash aggregate's partial phase, measured at 8 MB peak task memory
  * on the 10× probe (SCALE.md). This state is plain JVM heap, NOT
  * registered with the task memory manager and with no spill path: for
  * ultra-high key cardinality where keys_per_partition × k × rowBytes
  * approaches executor heap (billions of tiny groups with large rows),
  * prefer the sort-based window formulation, which spills. Integrating a
  * `BytesToBytesMap` + spill-to-sorter fallback is the known upgrade.
  * Until then the state is BOUNDED AT RUNTIME: each task counts its kept
  * rows and fails fast past `spark.graft.topk.maxStateEntries` (default
  * 8M ≈ hundreds of MB at typical row widths) with a message naming
  * `spark.graft.topkRewrite.enabled` — a clean error instead of an
  * executor OOM when a runaway key cardinality hits the operator.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  require(keys.nonEmpty, "top-k needs at least one key column (use orderBy+limit for global top-k)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** Top `k` rows per distinct value of `keyCols`, "top" = first under
    * `orderCols` (`(name, ascending)`; include a unique tiebreaker for
    * deterministic results). Output columns = input columns. */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKey(keyCols.map(attr), order, k, analyzed))
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // partial below the exchange, final above — EnsureRequirements
      // inserts the hash shuffle to satisfy the final's distribution
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    // read the cap driver-side (SQLConf isn't on executors) and close over it
    val maxEntries = conf.getConfString(
      TopKPerKeyExec.MaxStateEntriesKey, TopKPerKeyExec.DefaultMaxStateEntries.toString).toLong
    child.execute().mapPartitions { iter =>
      // max-heap under the requested order: head = worst kept row
      val ordering = GenerateOrdering.generate(order, childOutput)
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      var entries = 0L // = Σ heap sizes ≤ distinct keys × k
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ordering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) {
          entries += 1
          if (entries > maxEntries)
            throw new IllegalStateException(
              s"TopKPerKey kept state exceeded ${TopKPerKeyExec.MaxStateEntriesKey}=$maxEntries " +
                s"rows in one task (${heaps.size} keys so far × k=$k; unspillable JVM-heap state). " +
                "Raise the cap or repartition the input across more tasks. If this plan came " +
                "from the window-rank rewrite, spark.graft.topkRewrite.enabled=false restores " +
                "the spilling window-sort plan; callers of the native TopKPerKey API should " +
                "switch to the row_number-over-window formulation directly (the flag does not " +
                "affect them).")
          heap += row.copy()
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Per-task cap on kept rows (distinct keys × k) before failing fast —
    * the runtime guard for the operator's unspillable heap state. */
  val MaxStateEntriesKey = "spark.graft.topk.maxStateEntries"
  val DefaultMaxStateEntries: Long = 8L * 1000 * 1000
}
