package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** r19 optimization-round measurement harness (guide §1: measure first).
  *
  * For each named query: time PLANNING (analysis→physical) separately from
  * EXECUTION (noop materialize, same as Bench), and attribute execution to
  * task time vs everything else (driver/scheduler/stage gaps) with a
  * listener. Prints one TSV row per query:
  *
  *   name  plan_s  exec_s(min of N)  jobs  stages  tasks  task_time_s
  *   gc_s  shuffle_read_mb  shuffle_write_mb
  *
  * `exec_s − task_time_s/cores` ≫ 0 means the bill is stage scheduling /
  * driver work / serial actions, not executor compute — a different fix
  * class (fewer jobs/stages) than slow tasks (§2/§3/§4 fixes).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileProbe <regex>"
  */
object ProfileProbe {

  private final class Agg extends SparkListener {
    var jobs = 0
    var stages = 0
    var tasks = 0
    var taskTimeMs = 0L
    var gcMs = 0L
    var shufReadB = 0L
    var shufWriteB = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      stages += 1
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcMs += m.jvmGCTime
        shufReadB += m.shuffleReadMetrics.totalBytesRead
        shufWriteB += m.shuffleWriteMetrics.bytesWritten
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val pattern = args.headOption.getOrElse(".*").r
    val spark = GraftSession.builder("graft-profile", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => pattern.findFirstIn(n).isDefined }
    // warmup: JIT + codegen + classloading
    ordered.foreach { case (_, fn) =>
      try Bench.materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    spark.sharedState.cacheManager.clearCache()
    println("name\tplan_s\texec_s\tjobs\tstages\ttasks\ttask_s\tgc_s\tshuf_rd_mb\tshuf_wr_mb")
    ordered.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      // planning: build + force executedPlan, repeated to steady state
      val planTimes = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // forces analysis/optimization/planning
        (System.nanoTime() - t0) / 1e9
      }
      val execs = (1 to passes).map { _ =>
        val agg = new Agg
        spark.sparkContext.addSparkListener(agg)
        val t0 = System.nanoTime()
        Bench.materialize(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.removeSparkListener(agg)
        spark.sharedState.cacheManager.clearCache()
        (dt, agg)
      }
      val (execMin, agg) = execs.minBy(_._1)
      def f(v: Double) = (math.round(v * 1000) / 1000.0).toString
      println(Seq(name, f(planTimes.min), f(execMin),
        agg.jobs, agg.stages, agg.tasks,
        f(agg.taskTimeMs / 1e3), f(agg.gcMs / 1e3),
        f(agg.shufReadB / 1e6), f(agg.shufWriteB / 1e6)).mkString("\t"))
    }
    spark.stop()
  }
}
