package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Column DEFAULT values (ANSI/Delta `DEFAULT <expr>`): writes missing
  * the column get the default computed; explicit values always win; the
  * SQL face fills defaults analyzer-side through the v2 schema's
  * default metadata. */
class DefaultColumnsSpec extends SparkSpec {

  private def freshDir(): String = Files.createTempDirectory("defcol").toString + "/t"

  test("a Scala append missing a defaulted column gets the default; explicit wins") {
    val root = freshDir()
    ManifestTable.append(spark, root,
      spark.range(0).toDF("id").withColumn("status", lit("new")).select("id", "status"))
    ManifestTable.setProperty(spark, root, s"${ManifestTable.DefaultPrefix}status", "'new'")
    ManifestTable.append(spark, root, spark.range(5).toDF("id"))
    ManifestTable.append(spark, root,
      spark.range(5, 8).toDF("id").withColumn("status", lit("old")))
    val out = ManifestTable.read(spark, root)
    assert(out.filter(col("status") === "new").count() == 5)
    assert(out.filter(col("status") === "old").count() == 3)
  }

  test("SQL CREATE TABLE ... DEFAULT + INSERT with a column subset fills the rest") {
    val root = freshDir()
    spark.sql(
      s"""CREATE TABLE graft.`$root` (
         |  id BIGINT, status STRING DEFAULT 'new', score DOUBLE DEFAULT 0.5)""".stripMargin)
    spark.sql(s"INSERT INTO graft.`$root` (id) VALUES (1), (2)")
    spark.sql(s"INSERT INTO graft.`$root` (id, status) VALUES (3, 'old')")
    spark.sql(s"INSERT INTO graft.`$root` VALUES (4, 'x', 9.0)")
    val out = spark.sql(s"SELECT * FROM graft.`$root` ORDER BY id").collect()
    assert(out.length == 4)
    assert(out(0).getString(1) == "new" && out(0).getDouble(2) == 0.5)
    assert(out(2).getString(1) == "old" && out(2).getDouble(2) == 0.5)
    assert(out(3).getString(1) == "x" && out(3).getDouble(2) == 9.0)
    // explicit DEFAULT keyword resolves too
    spark.sql(s"INSERT INTO graft.`$root` VALUES (5, DEFAULT, DEFAULT)")
    assert(spark.sql(s"SELECT status, score FROM graft.`$root` WHERE id = 5").head
      .toSeq == Seq("new", 0.5))
  }

  test("defaults compose with identity and generated columns in one chain") {
    val root = freshDir()
    ManifestTable.append(spark, root,
      spark.range(0).toDF("v")
        .withColumn("id", col("v"))
        .withColumn("status", lit(""))
        .withColumn("neg", -col("v"))
        .select("id", "v", "status", "neg"))
    ManifestTable.setProperty(spark, root, s"${ManifestTable.IdentityPrefix}id", "1,1,false")
    ManifestTable.setProperty(spark, root, s"${ManifestTable.DefaultPrefix}status", "'ok'")
    ManifestTable.setProperty(spark, root, s"${ManifestTable.GeneratedPrefix}neg", "-v")
    ManifestTable.append(spark, root, spark.range(10).toDF("v"))
    val out = ManifestTable.read(spark, root)
    assert(out.count() == 10)
    assert(out.select("id").distinct().count() == 10)
    assert(out.filter(col("status") =!= "ok").count() == 0)
    assert(out.filter(col("neg") =!= -col("v")).count() == 0)
  }
}
