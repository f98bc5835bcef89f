package graft

/** Fails when any registered query's static plan grows a new shuffle
  * Exchange, BroadcastNestedLoopJoin, or CartesianProduct vs the committed
  * PLAN_SNAPSHOT.tsv — the scale regressions correctness tests can't see.
  * After an INTENTIONAL plan change, refresh with
  * `sbt "runMain graft.PlanSnapshot"` and commit the diff. */
class PlanGuardSpec extends SparkSpec {

  private lazy val snapshot = PlanSnapshot.load()

  test("snapshot covers every registered query") {
    val missing = SparkEntry.queries.keySet -- snapshot.keySet
    assert(missing.isEmpty,
      s"queries missing from PLAN_SNAPSHOT.tsv (run `sbt \"runMain graft.PlanSnapshot\"`): $missing")
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name plan within snapshot budget") {
      val now = PlanSnapshot.counts(spark, name, sf0001)
      val base = snapshot.getOrElse(name,
        fail(s"$name missing from PLAN_SNAPSHOT.tsv — run `sbt \"runMain graft.PlanSnapshot\"` and commit"))
      assert(now.cartesian == 0, s"CartesianProduct in $name: $now")
      assert(now.shuffles <= base.shuffles,
        s"$name grew shuffle Exchanges: ${base.shuffles} -> ${now.shuffles}")
      assert(now.bnlj <= base.bnlj,
        s"$name grew BroadcastNestedLoopJoins: ${base.bnlj} -> ${now.bnlj}")
    }
  }

  // EAGER keys (r18): their result frames are localized (0/0/0/0 by
  // design) — the corpus-scale plans they execute are guarded through
  // the stage seam, one `key#stage` snapshot row per stage
  SparkEntry.stagedKeys.toSeq.sorted.foreach { name =>
    test(s"$name corpus-scale stages within snapshot budget") {
      val stages = PlanSnapshot.stageCounts(spark, name, sf0001)
      assert(stages.nonEmpty, s"$name declares a stage seam but emitted no stages")
      stages.foreach { case (sn, now) =>
        val base = snapshot.getOrElse(sn,
          fail(s"$sn missing from PLAN_SNAPSHOT.tsv — run `sbt \"runMain graft.PlanSnapshot\"` and commit"))
        assert(now.cartesian == 0, s"CartesianProduct in $sn: $now")
        assert(now.shuffles <= base.shuffles,
          s"$sn grew shuffle Exchanges: ${base.shuffles} -> ${now.shuffles}")
        assert(now.bnlj <= base.bnlj,
          s"$sn grew BroadcastNestedLoopJoins: ${base.bnlj} -> ${now.bnlj}")
      }
    }
  }
}
