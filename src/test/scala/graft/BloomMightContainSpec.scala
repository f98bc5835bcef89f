package graft

import graft.plans.BloomMightContain
import org.apache.spark.sql.functions._

class BloomMightContainSpec extends SparkSpec {

  private def keys = spark.range(0, 1000).toDF("k")

  test("no false negatives; false-positive rate near the configured fpp") {
    val bloom = BloomMightContain.build(keys, "k", expectedItems = 1000, fpp = 0.01)
    // every inserted key must hit
    val hits = keys.where(BloomMightContain(col("k"), bloom)).count()
    assert(hits == 1000)
    // probes far outside the inserted range: ~1% may false-positive
    val fp = spark.range(1000000, 1100000).toDF("k")
      .where(BloomMightContain(col("k"), bloom)).count()
    assert(fp < 100000 * 0.05, s"false-positive count $fp implausibly high")
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    val bloom = BloomMightContain.build(keys, "k", 1000, 0.01)
    val probe = spark.range(0, 2000).toDF("k")
      .withColumn("k", when(col("k") % 7 === 0, lit(null)).otherwise(col("k")))
    val c = BloomMightContain(col("k"), bloom)
    val viaCodegen = probe.select(col("k"), c.as("hit")).collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = probe.select(col("k"), c.as("hit")).collect()
      assert(viaCodegen.map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq ==
        interp.map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // nulls in → nulls out
    viaCodegen.filter(_.isNullAt(0)).foreach(r => assert(r.isNullAt(1)))
  }

  test("bloom contamination variant matches the exact operator row for row") {
    val t = graft.sources.Tables(spark, sf0001)
    val exact = graft.operators.Dedup.contamination(t).collect().toSeq
    val bloomed = graft.operators.Dedup.contaminationBloom(t).collect().toSeq
    assert(bloomed == exact)
    assert(exact.nonEmpty, "fixture should produce contamination flags")
  }

  test("empty build side yields a filter that matches nothing (no NPE)") {
    val bloom = BloomMightContain.build(keys.limit(0), "k", 1000, 0.01)
    assert(keys.where(BloomMightContain(col("k"), bloom)).count() == 0)
  }

  test("broadcast transport agrees with the literal embedding (incl. nulls, both codegen modes)") {
    val bloom = BloomMightContain.build(keys, "k", 1000, 0.01)
    val probe = spark.range(0, 2000).toDF("k")
      .withColumn("k", when(col("k") % 7 === 0, lit(null)).otherwise(col("k")))
    // force the broadcast path regardless of sketch size
    val bytes = { val o = new java.io.ByteArrayOutputStream(); bloom.writeTo(o); o.toByteArray }
    val bcastCol = org.apache.spark.sql.GraftSqlBridge.column(
      graft.plans.BloomMightContainBcast(
        org.apache.spark.sql.GraftSqlBridge.expression(col("k")),
        spark.sparkContext.broadcast(bytes)))
    def rows(c: org.apache.spark.sql.Column) =
      probe.select(col("k"), c.as("hit")).collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
    val viaLiteral = rows(BloomMightContain(col("k"), bloom))
    assert(rows(bcastCol) == viaLiteral)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(rows(bcastCol) == viaLiteral)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("size-aware apply picks literal for small sketches and broadcast past the threshold") {
    import org.apache.spark.sql.GraftSqlBridge.{expression => exprOf}
    val small = BloomMightContain.build(keys, "k", 1000, 0.01)
    assert(exprOf(BloomMightContain(col("k"), small, spark))
      .find(_.isInstanceOf[graft.plans.BloomMightContain]).isDefined)
    // ~10M expected items at 1% fpp serializes to ~12 MB > the 1 MB threshold
    val big = org.apache.spark.util.sketch.BloomFilter.create(10L * 1000 * 1000, 0.01)
    (0L until 1000L).foreach(big.putLong)
    val c = BloomMightContain(col("k"), big, spark)
    assert(exprOf(c).find(_.isInstanceOf[graft.plans.BloomMightContainBcast]).isDefined)
    // and it still probes correctly end-to-end
    assert(keys.where(c).count() == 1000)
  }

  test("rejects non-foldable or mistyped sketch arguments") {
    val bloom = BloomMightContain.build(keys, "k", 1000, 0.01)
    val e = intercept[Exception] {
      keys.where(BloomMightContain(col("k").cast("int"), bloom)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bloom_might_contain"), e.getMessage)
  }
}
