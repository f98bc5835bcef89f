package graft

import graft.operators.Etl
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The point of Z-ordering is data skipping: every output file should have
  * a tight min/max bounding box in BOTH layout keys, so parquet footer
  * pruning can drop files for predicates on either. Measured here against
  * a hash-shuffled layout of the same data into the same file count. */
class ZorderSpec extends SparkSpec {

  private def lineitem = Tables(spark, sf0001).lineitem

  /** Mean per-file (max-min) extent of `key`, files = physical parquet. */
  private def meanExtent(path: String, key: String): Double = {
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name()).agg((max(col(key)) - min(col(key))).as("ext"))
    perFile.agg(avg("ext")).head().getDouble(0)
  }

  test("z-ordered files have tighter bounding boxes than shuffled layout on BOTH keys") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val zPath = s"$dir/z"; val rPath = s"$dir/r"
    Etl.zorderWrite(lineitem, "l_partkey", "l_suppkey", zPath, nFiles = 8)
    lineitem.repartition(8).write.mode("overwrite").parquet(rPath)

    val zPart = meanExtent(zPath, "l_partkey"); val rPart = meanExtent(rPath, "l_partkey")
    val zSupp = meanExtent(zPath, "l_suppkey"); val rSupp = meanExtent(rPath, "l_suppkey")
    // hash layout spreads the full key range into every file; z-order must
    // cut the average extent substantially on both dimensions at once
    assert(zPart < rPart * 0.8, s"partkey extent: z=$zPart vs shuffled=$rPart")
    assert(zSupp < rSupp * 0.8, s"suppkey extent: z=$zSupp vs shuffled=$rSupp")
    // no rows lost or duplicated by the layout rewrite
    assert(spark.read.parquet(zPath).count() == lineitem.count())
  }

  test("z-value interleave is a bijection on the masked key space") {
    import spark.implicits._
    val keys = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), ((1L << 21) - 1, (1L << 21) - 1))
      .toDF("a", "b")
    val z = keys.select(Etl.zInterleave(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(z.distinct.size == z.size)
    assert(z.head == 0L)
    assert(z(1) == 1L) // bit 0 of a → bit 0 of z
    assert(z(2) == 2L) // bit 0 of b → bit 1 of z
    assert(z.last == (1L << 42) - 1)
  }
}
