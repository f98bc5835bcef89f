package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Identity columns (Delta `GENERATED ALWAYS AS IDENTITY`): allocation
  * from an atomically-advancing high-water mark, uniqueness across
  * batches (gappy, never dense — the contract), ALWAYS vs BY DEFAULT
  * insert semantics, and survival through overwrite and compaction. */
class IdentityColumnsSpec extends SparkSpec {

  private def freshDir(): String = Files.createTempDirectory("identity").toString + "/t"

  private def mkTable(root: String, spec: String = "1,1,false"): Unit = {
    ManifestTable.append(spark, root,
      spark.range(0).toDF("v").withColumn("id", col("v")).select("id", "v"))
    ManifestTable.setProperty(spark, root, s"${ManifestTable.IdentityPrefix}id", spec)
  }

  test("appends allocate unique ids across batches; the mark advances atomically") {
    val root = freshDir()
    mkTable(root)
    ManifestTable.append(spark, root, spark.range(100).toDF("v"))
    ManifestTable.append(spark, root, spark.range(100, 250).toDF("v"))
    val out = ManifestTable.read(spark, root)
    assert(out.count() == 250)
    assert(out.select("id").distinct().count() == 250, "identity ids must be unique")
    assert(out.agg(min("id")).head.getLong(0) >= 1L)
    // batch 2's ids all exceed batch 1's (the mark moved past them)
    val b1max = out.filter(col("v") < 100).agg(max("id")).head.getLong(0)
    val b2min = out.filter(col("v") >= 100).agg(min("id")).head.getLong(0)
    assert(b2min > b1max, s"second batch ids must start past the first's ($b2min vs $b1max)")
  }

  test("ALWAYS refuses explicit values; BY DEFAULT accepts and advances past them") {
    val root = freshDir()
    mkTable(root) // ALWAYS
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root,
        spark.range(5).toDF("v").withColumn("id", col("v")))
    }
    val root2 = freshDir()
    mkTable(root2, spec = "1,1,true") // BY DEFAULT
    ManifestTable.append(spark, root2,
      spark.range(5).toDF("v").withColumn("id", col("v") + 1000L))
    ManifestTable.append(spark, root2, spark.range(5, 8).toDF("v")) // allocated
    val out = ManifestTable.read(spark, root2)
    assert(out.count() == 8)
    assert(out.select("id").distinct().count() == 8)
    assert(out.filter(col("v") >= 5).agg(min("id")).head.getLong(0) > 1004L,
      "allocation must resume past the explicitly used ids")
  }

  test("negative step descends; start/step are honored") {
    val root = freshDir()
    mkTable(root, spec = "-10,-5,false")
    ManifestTable.append(spark, root, spark.range(4).toDF("v"))
    val ids = ManifestTable.read(spark, root).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.length == 4 && ids.distinct.length == 4)
    assert(ids.max <= -10L, s"ids must descend from -10, got ${ids.toSeq}")
    ManifestTable.append(spark, root, spark.range(4, 6).toDF("v"))
    val out = ManifestTable.read(spark, root)
    assert(out.select("id").distinct().count() == 6)
  }

  test("identity sequence survives overwrite and compaction") {
    val root = freshDir()
    mkTable(root)
    ManifestTable.append(spark, root, spark.range(50).toDF("v"))
    val maxBefore = ManifestTable.read(spark, root).agg(max("id")).head.getLong(0)
    ManifestTable.overwrite(spark, root, spark.range(10).toDF("v"))
    val afterOw = ManifestTable.read(spark, root)
    assert(afterOw.count() == 10)
    assert(afterOw.agg(min("id")).head.getLong(0) > maxBefore,
      "an overwrite must not reset the identity sequence")
    ManifestTable.compact(spark, root)
    ManifestTable.append(spark, root, spark.range(10, 15).toDF("v"))
    val out = ManifestTable.read(spark, root)
    assert(out.select("id").distinct().count() == 15)
  }

  test("merge requires the identity column explicit in its source") {
    val root = freshDir()
    mkTable(root, spec = "1,1,true")
    ManifestTable.append(spark, root, spark.range(10).toDF("v"))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, root, spark.range(3).toDF("v"), Seq("v"))
    }
    assert(e.getMessage.contains("identity column id"))
    // with the column provided it behaves like any merge
    val src = ManifestTable.read(spark, root).filter(col("v") < 2)
      .withColumn("v", col("v") + 100L)
    ManifestTable.merge(spark, root, src, Seq("id"))
    assert(ManifestTable.read(spark, root).filter(col("v") >= 100L).count() == 2)
  }

  test("SQL CREATE TABLE ... GENERATED ALWAYS AS IDENTITY round-trips and allocates") {
    val root = freshDir()
    spark.sql(
      s"""CREATE TABLE graft.`$root` (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
         |  v BIGINT)""".stripMargin)
    val props = spark.sql(s"DESCRIBE DETAIL graft.`$root`").head.getString(7)
    assert(props.contains(s"${ManifestTable.IdentityPrefix}id"), s"got $props")
    ManifestTable.append(spark, root, spark.range(6).toDF("v"))
    val ids = ManifestTable.read(spark, root).select("id").collect().map(_.getLong(0))
    assert(ids.length == 6 && ids.distinct.length == 6)
    assert(ids.forall(i => i >= 100L && (i - 100L) % 3 == 0),
      s"ids must follow START 100 STEP 3, got ${ids.toSeq.sorted}")
  }
}
