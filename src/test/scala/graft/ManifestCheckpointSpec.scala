package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Parquet manifest checkpoints: a derivative columnar encoding of one
  * version's (full) manifest that readers prefer and fall back from —
  * the text manifest stays the authoritative, arbitrated commit
  * format. */
class ManifestCheckpointSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("ckpt").toString + "/t"

  private def rows(start: Int, n: Int): DataFrame =
    spark.range(start, start + n).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("long"))
      .withColumn("v", (col("id") * 10).cast("long"))

  private def ckptFiles(root: String): Seq[java.io.File] = {
    val dir = new java.io.File(s"${new java.io.File(root).getAbsolutePath}/_manifests")
    if (!dir.exists()) Nil
    else dir.listFiles().filter(_.getName.endsWith(".checkpoint.parquet")).toSeq
  }

  test("threshold property: commits publish a checkpoint; reads agree with the text parse") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows(0, 100))
    assert(ckptFiles(root).isEmpty, "below default threshold: no checkpoint")
    ManifestTable.setProperty(spark, root, ManifestTable.CheckpointMinFilesProperty, "1")
    ManifestTable.append(spark, root, rows(100, 100))
    val cks = ckptFiles(root)
    assert(cks.nonEmpty, "threshold 1: the commit must publish a checkpoint")
    // checkpointed read equals the text-parse read (delete the sidecar,
    // re-read, compare)
    val viaCkpt = ManifestTable.read(spark, root).orderBy("id").collect()
    cks.foreach(f => assert(f.delete()))
    val viaText = ManifestTable.read(spark, root).orderBy("id").collect()
    assert(viaCkpt.toSeq === viaText.toSeq)
    assert(viaCkpt.length === 200)
  }

  test("stats survive the checkpoint: skipping prunes identically") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows(0, 50).repartition(4))
    ManifestTable.setProperty(spark, root, ManifestTable.CheckpointMinFilesProperty, "1")
    ManifestTable.append(spark, root, rows(50, 50).repartition(4))
    assert(ckptFiles(root).nonEmpty)
    val pruned = ManifestTable.readWhere(spark, root, col("id") === 7L)
    assert(pruned.count() === 1)
    // DML over a checkpoint-served snapshot behaves identically
    val v = ManifestTable.delete(spark, root, col("id") < 10L)
    assert(v.nonEmpty)
    assert(ManifestTable.read(spark, root).count() === 90)
  }

  test("checkpointed readWhere prunes on executors: same candidates, same rows as text") {
    val root = freshRoot()
    // clustered layout so a range predicate prunes hard
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("long"))
      .withColumn("v", (col("id") * 10).cast("long"))
      .repartitionByRange(8, col("id"))
    ManifestTable.append(spark, root, df)
    ManifestTable.setProperty(spark, root, ManifestTable.CheckpointMinFilesProperty, "1")
    ManifestTable.append(spark, root, rows(4000, 100))
    assert(ckptFiles(root).nonEmpty)
    val pred = col("id") >= 100L && col("id") < 300L
    // the distributed path must actually ENGAGE (not silently fall back)
    val direct = ManifestTable.checkpointPrune(spark, root,
      ManifestTable.currentVersion(spark, root).get, pred)
    assert(direct.isDefined, "checkpointPrune fell back to the text path")
    val viaCkpt = ManifestTable.readCandidates(spark, root, pred)
    val rowsCkpt = ManifestTable.readWhere(spark, root, pred).orderBy("id").collect()
    // drop the sidecar: the text path must produce the identical prune set
    ckptFiles(root).foreach(f => assert(f.delete()))
    val viaText = ManifestTable.readCandidates(spark, root, pred)
    assert(viaCkpt.toSet === viaText.toSet,
      s"checkpoint prune diverged: ${viaCkpt.toSet} vs ${viaText.toSet}")
    assert(viaCkpt.size < 9, s"range predicate must prune: ${viaCkpt.size} files")
    val rowsText = ManifestTable.readWhere(spark, root, pred).orderBy("id").collect()
    assert(rowsCkpt.toSeq === rowsText.toSeq)
    assert(rowsCkpt.length === 200)
  }

  test("checkpointed readWhere still applies deletion vectors") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows(0, 200).coalesce(2))
    ManifestTable.setProperty(spark, root, "graft.enableDeletionVectors", "true")
    ManifestTable.setProperty(spark, root, ManifestTable.CheckpointMinFilesProperty, "1")
    ManifestTable.delete(spark, root, col("id") < 50L)
    assert(ckptFiles(root).nonEmpty)
    val got = ManifestTable.readWhere(spark, root, col("id") < 100L)
    assert(got.count() === 50)
    assert(got.agg(min("id")).head().getLong(0) === 50L)
  }

  test("corrupt checkpoint falls back to text silently") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows(0, 30))
    ManifestTable.setProperty(spark, root, ManifestTable.CheckpointMinFilesProperty, "1")
    ManifestTable.append(spark, root, rows(30, 30))
    val ck = ckptFiles(root).maxBy(_.getName)
    java.nio.file.Files.write(ck.toPath, Array[Byte](1, 2, 3, 4)) // garbage
    assert(ManifestTable.read(spark, root).count() === 60)
  }

  test("explicit writeManifestCheckpoint + vacuum reclaims sidecars with their versions") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows(0, 20))
    val v1 = ManifestTable.writeManifestCheckpoint(spark, root)
    assert(v1 === 1L)
    assert(ckptFiles(root).size === 1)
    ManifestTable.append(spark, root, rows(20, 20))
    ManifestTable.writeManifestCheckpoint(spark, root)
    assert(ckptFiles(root).size === 2)
    // vacuum keepVersions=1, no age guard: v1 text + sidecar both go
    ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    assert(ckptFiles(root).size === 1)
    assert(ManifestTable.read(spark, root).count() === 40)
  }

  test("deletion vectors round-trip through the checkpoint") {
    val root = freshRoot()
    ManifestTable.append(spark, root, rows(0, 100).coalesce(1))
    ManifestTable.setProperty(spark, root, "graft.enableDeletionVectors", "true")
    ManifestTable.delete(spark, root, col("id") < 10L)
    ManifestTable.writeManifestCheckpoint(spark, root)
    // the checkpoint-served snapshot must keep applying the DV
    assert(ManifestTable.read(spark, root).count() === 90)
    assert(ManifestTable.read(spark, root).agg(min("id")).head().getLong(0) === 10L)
  }
}
