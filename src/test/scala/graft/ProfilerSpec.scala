package graft

import graft.operators.Profiler
import graft.sources.Tables

/** Sketch-based profiling: the count-min estimates must dominate the
  * exact counts and stay within the ε·n error bound — the contract that
  * lets merged per-partition sketches replace exact per-key counting. */
class ProfilerSpec extends SparkSpec {

  test("count-min sketch estimates bound the exact counts within eps*n") {
    val events = Tables(spark, sf0001).events
    val n = events.count()
    val exact = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probes = exact.keys.toSeq.sorted.take(20)
    val eps = 0.001
    val est = Profiler.cmsEstimates(events, "user_id", probes, eps = eps)
    probes.foreach { p =>
      assert(est(p) >= exact(p), s"CMS underestimated key $p: ${est(p)} < ${exact(p)}")
      assert(est(p) <= exact(p) + (eps * n).ceil.toLong,
        s"CMS error for key $p exceeds eps*n: ${est(p)} vs ${exact(p)}")
    }
  }

  test("count-min sketch is deterministic under the fixed seed") {
    val events = Tables(spark, sf0001).events
    val a = Profiler.cmsEstimates(events, "user_id", Seq(1L, 2L, 3L))
    val b = Profiler.cmsEstimates(events.repartition(5), "user_id", Seq(1L, 2L, 3L))
    assert(a == b) // merge order and partitioning must not change estimates
  }
}
