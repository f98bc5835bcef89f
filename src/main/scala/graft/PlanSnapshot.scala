package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guard: per-query counts of the plan nodes that
  * decide scale behavior (shuffle Exchanges, broadcasts, nested-loop and
  * cartesian joins), snapshotted to PLAN_SNAPSHOT.tsv.
  *
  * PlanGuardSpec recomputes the counts every test run and fails when a
  * query grows a NEW shuffle/nested-loop/cartesian vs the committed
  * snapshot — the class of regression correctness tests can't see (the
  * rows stay right; the 100-TB bill doesn't). Counts come from the static
  * plan (AQE's initial plan), the worst case the optimizer must then
  * improve at runtime.
  *
  * Refresh after intentional plan changes: `sbt "runMain graft.PlanSnapshot"`.
  */
object PlanSnapshot {

  final case class Counts(shuffles: Int, broadcasts: Int, bnlj: Int, cartesian: Int) {
    def tsv: String = s"$shuffles\t$broadcasts\t$bnlj\t$cartesian"
  }

  val SnapshotPath = "PLAN_SNAPSHOT.tsv"
  val DataDir = "/root/testdata/sf0.001"

  // detail-section headers in formatted explain: "(5) Exchange"
  private val nodeLine = """^\((\d+)\) (.+?)\s*$""".r

  def counts(spark: SparkSession, name: String, dir: String): Counts = {
    // Measure from a cache-free session: queries that persist() internal
    // subtrees (q15's revenue frame, the recall audits' exact/ranked
    // frames) leave CacheManager entries behind, and a later explain of
    // the same subtree gets an InMemoryRelation substituted with
    // different stats — join strategies and exchange counts then depend
    // on what ran before, not on the query. Clearing first makes the
    // snapshot and the guard measure the same deterministic plan.
    spark.catalog.clearCache()
    countsOf(SparkEntry.queries(name)(spark, dir))
  }

  private def countsOf(df: org.apache.spark.sql.DataFrame): Counts = {
    val text = df.queryExecution.explainString(FormattedMode)
    val names = text.linesIterator.collect { case nodeLine(_, n) => n }.toSeq
    Counts(
      shuffles = names.count(_ == "Exchange"),
      broadcasts = names.count(_ == "BroadcastExchange"),
      bnlj = names.count(_.startsWith("BroadcastNestedLoopJoin")),
      cartesian = names.count(_.startsWith("CartesianProduct")))
  }

  /** Stage counts for EAGER keys (r18 — the r17 verdict's #1): the
    * key's `queries` entry returns a small localized frame whose
    * snapshot is 0/0/0/0, so the corpus-scale plans it executes are
    * explained through [[SparkEntry.explainStages]] and recorded as
    * `key#stage` rows — the result row stays, documenting that the
    * RETURNED frame is scale-free by design. */
  def stageCounts(spark: SparkSession, name: String, dir: String): Seq[(String, Counts)] = {
    spark.catalog.clearCache()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Counts)]
    SparkEntry.explainStages(name, spark, dir)((stage, df) =>
      out += (s"$name#$stage" -> countsOf(df)))
    out.toSeq
  }

  def load(path: String = SnapshotPath): Map[String, Counts] =
    scala.io.Source.fromFile(path, "UTF-8").getLines()
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(n, s, b, j, c) = l.split('\t')
        n -> Counts(s.toInt, b.toInt, j.toInt, c.toInt)
      }.toMap

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-plan-snapshot", "local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val base = s"$n\t${counts(spark, n, DataDir).tsv}"
      base +: stageCounts(spark, n, DataDir).map { case (sn, c) => s"$sn\t${c.tsv}" }
    }
    val out = new java.io.PrintWriter(SnapshotPath, "UTF-8")
    try {
      out.println("# query\tshuffle_exchanges\tbroadcast_exchanges\tbroadcast_nested_loop_joins\tcartesian_products")
      lines.foreach(out.println)
    } finally out.close()
    println(s"wrote ${lines.size} plan snapshots to $SnapshotPath")
    spark.stop()
  }
}
