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

  test("array_bisect matches the O(B) filter-count formulation, both codegen modes") {
    import graft.plans.ArrayBisect
    val bounds = (1 to 31).map(_ * 10.0)
    val probe = spark.range(0, 400).toDF("id")
      .withColumn("x", when(col("id") % 11 === 0, lit(null))
        .otherwise((col("id") - lit(50)).cast("double")))
    val boundsLit = array(bounds.map(lit): _*)
    def rows() = probe.select(col("x"),
      ArrayBisect(bounds, col("x")).as("fast"),
      size(filter(boundsLit, b => b <= col("x"))).as("slow")).collect()
    def check(rs: Array[org.apache.spark.sql.Row]): Unit = rs.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getInt(1) == r.getInt(2), s"x=${r.getDouble(0)}")
    }
    check(rows())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check(rows())
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("array_bisect is registered and callable from SQL") {
    assert(spark.catalog.functionExists("array_bisect"))
    val got = spark.sql(
      "SELECT array_bisect(array(1.0d, 5.0d, 9.0d), x) AS b FROM VALUES (0.5d), (5.0d), (12.0d) t(x)")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 2, 3))
    // the SQL path bypasses the Scala builder's sortedness require — the
    // expression itself must reject an unsorted boundary array, not
    // binary-search it into silently wrong counts
    val e = intercept[Exception] {
      spark.sql("SELECT array_bisect(array(9.0d, 1.0d, 5.0d), 4.0d)").collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("sorted"), s"unexpected: $messages")
  }

  test("rank-bucketed z-order keeps pruning effective under exponential key skew") {
    import spark.implicits._
    // keyA log-spaced over 6 decades: linear min/max scaling crowds ~99%
    // of rows into the lowest z-cells; equi-depth bucketing spreads them
    val rows = spark.range(60000).select(
      (pow(lit(10.0), (col("id") % 600).cast("double") / lit(100.0))).cast("long").as("ka"),
      (col("id") * 104729 % 1000).as("kb"),
      col("id").as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("zrank").toString
    val linPath = s"$dir/lin"; val rnkPath = s"$dir/rnk"
    Etl.zorderWrite(rows, "ka", "kb", linPath, nFiles = 8)
    Etl.zorderWriteRanked(rows, "ka", "kb", rnkPath, nFiles = 8)
    assert(spark.read.parquet(rnkPath).count() == 60000)
    // point-lookup pruning proxy: how many files' [min,max] must be read
    // for probes in the dense low decades, summed over probes
    def filesTouched(path: String, probes: Seq[Long]): Int = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min("ka").as("lo"), max("ka").as("hi"))
        .select("lo", "hi").as[(Long, Long)].collect()
      probes.map(p => spans.count { case (lo, hi) => lo <= p && p <= hi }).sum
    }
    val probes = Seq(1L, 10L, 100L, 1000L)
    val lin = filesTouched(linPath, probes)
    val rnk = filesTouched(rnkPath, probes)
    assert(rnk < lin,
      s"rank-z should touch fewer files than linear-z on skewed probes ($rnk vs $lin)")
  }

  test("ranked z-order handles empty input and empty boundary arrays") {
    import graft.plans.ArrayBisect
    // empty bounds: everything lands in bucket 0
    val n = spark.range(5).select(ArrayBisect(Seq.empty, col("id").cast("double")).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(n == Seq(0, 0, 0, 0, 0))
    // empty frame: percentile_approx yields null bounds — write must not throw
    val dir = java.nio.file.Files.createTempDirectory("zempty").toString
    val empty = spark.range(0).select(col("id").as("ka"), col("id").as("kb"))
    Etl.zorderWriteRanked(empty, "ka", "kb", s"$dir/e", nFiles = 2)
    assert(spark.read.parquet(s"$dir/e").count() == 0)
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
