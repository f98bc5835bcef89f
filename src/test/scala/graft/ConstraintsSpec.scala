package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Table CHECK constraints (Delta `ALTER TABLE … ADD CONSTRAINT` /
  * write-time invariants): registered in the manifest, validated
  * against existing data on add, enforced in-write by every verb that
  * introduces or rewrites rows, carried across commits, and restored
  * with the snapshot they were part of. */
class ConstraintsSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("constraints").toString + "/t"

  private def rows(start: Int = 0, n: Int = 20): DataFrame =
    spark.range(start, start + n).toDF("id")
      .withColumn("v", (col("id") * 10).cast("long"))

  /** The violation surfaces from inside a Spark job — search the cause
    * chain for the raise_error payload. */
  private def chain(t: Throwable): String = {
    val sb = new StringBuilder
    var c: Throwable = t
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  test("addConstraint validates existing data; a violating table refuses the constraint") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows())
    val v = ManifestTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    assert(v == 2L)
    assert(ManifestTable.constraints(spark, root) == Map("v_nonneg" -> "v >= 0"))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, root, "v_small", "v < 100")
    }
    assert(e.getMessage.contains("v_small") && e.getMessage.contains("existing data"))
    assert(ManifestTable.constraints(spark, root).keySet == Set("v_nonneg"),
      "the refused constraint must not land")
  }

  test("append/overwrite/replaceWhere enforce; the violating row is named; table unchanged") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows(), partitionBy = Nil)
    ManifestTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    val before = ManifestTable.currentVersion(spark, root)
    val badRows = rows(100, 5).withColumn("v", lit(-1L))

    val ea = intercept[Throwable] { ManifestTable.append(spark, root, badRows) }
    assert(chain(ea).contains("CHECK constraint v_nonneg (v >= 0) violated by row"))
    assert(chain(ea).contains("-1"), "the violating row's values must be in the error")

    val eo = intercept[Throwable] { ManifestTable.overwrite(spark, root, badRows) }
    assert(chain(eo).contains("v_nonneg"))

    assert(ManifestTable.currentVersion(spark, root) == before, "no version may land")
    assert(ManifestTable.read(spark, root).count() == 20)
    // a clean append still works and carries the constraint forward
    ManifestTable.append(spark, root, rows(100, 5))
    assert(ManifestTable.constraints(spark, root).contains("v_nonneg"))

    // replaceWhere on a partitioned table
    val proot = freshRoot()
    ManifestTable.append(spark, proot,
      rows().withColumn("day", (col("id") % 2).cast("string")), partitionBy = Seq("day"))
    ManifestTable.addConstraint(spark, proot, "v_nonneg", "v >= 0")
    val er = intercept[Throwable] {
      ManifestTable.replaceWhere(spark, proot,
        rows(0, 3).withColumn("v", lit(-7L)).withColumn("day", lit("0")),
        col("day") === "0")
    }
    assert(chain(er).contains("v_nonneg"))
    assert(ManifestTable.read(spark, proot).count() == 20)
  }

  test("NOT NULL as CHECK; NULL check results pass (SQL semantics)") {
    val root = freshRoot()
    ManifestTable.append(spark, root,
      rows().withColumn("s", concat(lit("k"), col("id"))))
    ManifestTable.addConstraint(spark, root, "s_not_null", "s IS NOT NULL")
    // a NULL in the constrained column fails
    val bad = rows(100, 2).withColumn("s",
      when(col("id") === 100, lit(null).cast("string")).otherwise(lit("x")))
    assert(chain(intercept[Throwable] { ManifestTable.append(spark, root, bad) })
      .contains("s_not_null"))
    // but a CHECK whose result is NULL passes the row: v > id is null when s is compared… use
    // an expression over a nullable column: "length(s) > 0" is NULL for NULL s — with a
    // different column constrained, NULL results must admit the row
    val root2 = freshRoot()
    ManifestTable.append(spark, root2,
      rows().withColumn("s", concat(lit("k"), col("id"))))
    ManifestTable.addConstraint(spark, root2, "s_len", "length(s) > 0")
    val nullRow = rows(100, 1).withColumn("s", lit(null).cast("string"))
    ManifestTable.append(spark, root2, nullRow) // length(NULL) > 0 is NULL → passes
    assert(ManifestTable.read(spark, root2).count() == 21)
  }

  test("merge and update enforce on rewritten rows; delete is never blocked") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows())
    ManifestTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    // merge introducing a violating upsert
    val em = intercept[Throwable] {
      ManifestTable.merge(spark, root, rows(0, 3).withColumn("v", lit(-1L)), Seq("id"))
    }
    assert(chain(em).contains("v_nonneg"))
    assert(ManifestTable.read(spark, root).count() == 20, "failed merge must not publish")
    // update SET that violates
    val eu = intercept[Throwable] {
      ManifestTable.update(spark, root, col("id") < 3, Map("v" -> lit(-5L)))
    }
    assert(chain(eu).contains("v_nonneg"))
    // clean merge and update still work
    ManifestTable.merge(spark, root, rows(0, 3).withColumn("v", lit(7L)), Seq("id"))
    ManifestTable.update(spark, root, col("id") === 5, Map("v" -> lit(123L)))
    // delete only removes rows — never constraint-checked
    assert(ManifestTable.delete(spark, root, col("id") >= 15).nonEmpty)
    assert(ManifestTable.read(spark, root).count() == 15)
  }

  test("dropConstraint lifts enforcement; overwriteSchema drops the set; restore brings it back") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows())
    ManifestTable.addConstraint(spark, root, "v_nonneg", "v >= 0") // v2
    assert(ManifestTable.dropConstraint(spark, root, "nope").isEmpty)
    assert(ManifestTable.dropConstraint(spark, root, "v_nonneg").contains(3L))
    // violating rows now land
    ManifestTable.append(spark, root, rows(100, 2).withColumn("v", lit(-1L)))
    assert(ManifestTable.read(spark, root).count() == 22)
    // restore to v2 restores the constraint set with the data
    ManifestTable.restore(spark, root, 2L)
    assert(ManifestTable.constraints(spark, root) == Map("v_nonneg" -> "v >= 0"))
    assert(ManifestTable.read(spark, root).count() == 20)
    // schema overwrite drops constraints (they may reference old columns)
    ManifestTable.overwrite(spark, root,
      spark.range(5).toDF("other"), overwriteSchema = true)
    assert(ManifestTable.constraints(spark, root).isEmpty)
  }

  test("streaming exactly-once writers enforce constraints too") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows())
    ManifestTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    assert(chain(intercept[Throwable] {
      ManifestTable.exactlyOnceAppend(spark, root,
        rows(100, 2).withColumn("v", lit(-3L)), "app", 1L)
    }).contains("v_nonneg"))
    val w = ManifestTable.exactlyOnceMergeWriter(root, Seq("id"), "cdc")
    assert(chain(intercept[Throwable] {
      w(rows(0, 2).withColumn("v", lit(-9L)), 1L)
    }).contains("v_nonneg"))
    assert(ManifestTable.read(spark, root).count() == 20)
  }
}
