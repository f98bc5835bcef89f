package graft

import graft.sources.{DeletionVectors, DeltaLake}
import org.apache.spark.sql.functions._

/** Deletion-vector read-path A/B: the same aggregate over a Delta
  * fixture, once with no DVs (plain multi-path scan) and once with a DV
  * on every file killing 10% of its rows (per-file `_metadata.row_index`
  * anti-join). Measures what DV support costs at read time and proves
  * the result is the logical content, at probe scale.
  *
  * The quantity that matters at 100 TB: DV overhead is per-DV'd-FILE
  * (one extra join against that file's expanded positions) and the
  * positions expand on executors — the driver only ever holds the
  * compact bitmaps. Files without DVs keep the stock scan, so a lake
  * with few DV'd files pays only for those. Writes the
  * "## Deletion-vector read overhead" section of SCALE.md.
  *
  * Usage: `sbt "runMain graft.DvProbe"`; env knobs
  * `SPARK_GRAFT_DV_ROWS` (default 8,000,000), `SPARK_GRAFT_DV_FILES`
  * (default 16), `SPARK_GRAFT_CPUS`.
  */
object DvProbe {

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_DV_ROWS", "8000000").toLong
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_DV_FILES", "16").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-dv-probe", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_dvprobe").toString + "/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val perFile = rows / nFiles
    // one sorted file per bucket so row index == position within the file
    (0 until nFiles).foreach { i =>
      val tmp = java.nio.file.Files.createTempDirectory("dvp").toString + "/o"
      spark.range(i * perFile, (i + 1) * perFile).toDF("id")
        .withColumn("v", col("id") % 97)
        .coalesce(1).sortWithinPartitions("id").write.parquet(tmp)
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).toArray
        .map(_.asInstanceOf[java.nio.file.Path]).find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(src, java.nio.file.Paths.get(root, f"part-$i%05d.parquet"))
    }
    def jstr(s: String) = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JString(s)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, true),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType, true)))
    val logDir = java.nio.file.Paths.get(root, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    def commit(v: Long, lines: Seq[String]): Unit =
      java.nio.file.Files.write(logDir.resolve(f"$v%020d.json"),
        (lines.mkString("\n") + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val header = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"dv-probe","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(schema.json)},"partitionColumns":[],"configuration":{},"createdTime":1}}""")

    // v0: no DVs
    commit(0, header ++ (0 until nFiles).map { i =>
      s"""{"add":{"path":${jstr(f"part-$i%05d.parquet")},"partitionValues":{},"size":1,""" +
        """"modificationTime":1,"dataChange":true}}"""
    })
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def agg(version: Long): (Long, Long) = {
      val df = DeltaLake.read(spark, root, versionAsOf = Some(version))
      val r = df.agg(count(lit(1)), sum("v")).head
      (r.getLong(0), r.getLong(1))
    }
    val (_, warm) = time(agg(0))
    val ((nPlain, sumPlain), tPlain) = time(agg(0))

    // v1: every file re-added with an inline DV killing its first 10%
    val killPerFile = perFile / 10
    commit(1, (0 until nFiles).flatMap { i =>
      val dv = "," + DeletionVectors.inlineDescriptorJson(0L until killPerFile)
      Seq(
        s"""{"remove":{"path":${jstr(f"part-$i%05d.parquet")},"deletionTimestamp":2,"dataChange":true}}""",
        s"""{"add":{"path":${jstr(f"part-$i%05d.parquet")},"partitionValues":{},"size":1,""" +
          s""""modificationTime":1,"dataChange":true$dv}}""")
    })
    val (_, warmDv) = time(agg(1))
    val ((nDv, sumDv), tDv) = time(agg(1))

    // correctness: the DV'd read equals the logical content
    val expectDropped = killPerFile * nFiles
    require(nDv == rows - expectDropped, s"DV read returned $nDv rows, want ${rows - expectDropped}")
    require(nPlain == rows, s"plain read returned $nPlain rows, want $rows")

    println(f"""DVPROBE rows=$rows files=$nFiles killPerFile=$killPerFile
         |plain:  $tPlain%.2f s (warm $warm%.2f) n=$nPlain sum=$sumPlain
         |dv10%%:  $tDv%.2f s (warm $warmDv%.2f) n=$nDv sum=$sumDv
         |overhead: ${(tDv / tPlain - 1) * 100}%.1f %%""".stripMargin)

    // ---- write-path A/B: the same scattered 0.1% DELETE on a graft
    // table, copy-on-write (every touched file rewritten whole) vs
    // merge-on-read (a bitmap per touched file). The predicate hits all
    // files, so CoW rewrites the entire table — the worst case MoR
    // deletes exist for.
    import graft.sources.ManifestTable
    def buildGraft(): String = {
      val r = java.nio.file.Files.createTempDirectory("graft_dvw").toString + "/t"
      ManifestTable.append(spark, r,
        spark.range(rows).toDF("id").withColumn("v", col("id") % 97)
          .repartitionByRange(nFiles, col("id")).sortWithinPartitions("id"))
      r
    }
    val pred = col("id") % 1000 === 0L
    val rootCow = buildGraft()
    val (_, tCow) = time(ManifestTable.delete(spark, rootCow, pred))
    val rootMor = buildGraft()
    ManifestTable.setProperty(spark, rootMor, ManifestTable.DvProperty, "true")
    val (_, tMor) = time(ManifestTable.delete(spark, rootMor, pred))
    def gAgg(root: String): (Long, Long) = {
      val r = ManifestTable.read(spark, root).agg(count(lit(1)), sum("v")).head
      (r.getLong(0), r.getLong(1))
    }
    val ((nCow, sCow), tReadCow) = time(gAgg(rootCow))
    val ((nMor, sMor), tReadMor) = time(gAgg(rootMor))
    require(nCow == rows - rows / 1000 && nCow == nMor && sCow == sMor,
      s"CoW/MoR delete results diverge: ($nCow, $sCow) vs ($nMor, $sMor)")
    println(f"""DVPROBE write A/B: scattered 0.1%% delete over all $nFiles files
         |cow delete: $tCow%.2f s   read-after: $tReadCow%.2f s
         |mor delete: $tMor%.2f s   read-after: $tReadMor%.2f s
         |delete speedup: ${tCow / tMor}%.1f x""".stripMargin)
    spark.stop()
  }
}
