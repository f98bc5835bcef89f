package graft

import graft.sources.{MedallionSink, Tables}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MedallionSinkSpec extends SparkSpec {

  test("partitioned write + append + partition pruning") {
    val dir = Files.createTempDirectory("medallion").toString + "/events"
    val ev = Tables(spark, sf0001).events.withColumn("day", to_date(col("ts")))
    MedallionSink.write(ev, dir, Seq("day"))
    val firstCount = spark.read.parquet(dir).count()
    assert(firstCount == 1000)
    MedallionSink.write(ev.limit(10), dir, Seq("day"), SaveMode.Append)
    assert(spark.read.parquet(dir).count() == firstCount + 10)
    // partition filter prunes to one day's folder
    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-01")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0 && scan.contains("PartitionFilters"))
  }

  test("compaction rewrites fragmented dataset to fewer files") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = spark.range(1000).toDF("id")
    df.repartition(50).write.parquet(dir) // 50 small files
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 50)
    MedallionSink.compact(spark, dir, targetFileMb = 128)
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < before)
    assert(spark.read.parquet(dir).count() == 1000)
  }
}
