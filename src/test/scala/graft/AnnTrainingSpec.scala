package graft

import graft.operators.{AnnTraining, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trained (Lloyd) codebooks vs the md5-sampled baseline, on a corpus
  * with REAL cluster structure (the synthetic benchmark embeddings are
  * uniform, where training can't help — here it must). */
class AnnTrainingSpec extends SparkSpec {

  private val Dim = Similarity.EmbeddingDim
  private val NClusters = 4
  private val N = 240

  /** 4 well-separated centers; vector i sits near center i%4 with small
    * deterministic jitter. Labels are i%10 — deliberately DECORRELATED
    * from geometry, the regime where label-partition IVF fails and a
    * trained quantizer wins. vec_id 0 is the query, near center 0. */
  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ann_train").toString
    def jitter(i: Int, d: Int): Double = ((i * 31 + d * 17) % 101 - 50) / 100.0
    def center(c: Int, d: Int): Double = if (d / (Dim / NClusters) == c) 8.0 else 0.0
    val rows: Seq[Row] = (0 until N).map { i =>
      val c = i % NClusters
      val v = (0 until Dim).map(d => (center(c, d) + jitter(i, d)).toFloat)
      Row(i.toLong + 1, (i % 10).toLong, v)
    } :+ Row(0L, 0L, (0 until Dim).map(d => (center(0, d) + 0.05 * (d % 3)).toFloat))
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("label", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def tables = Tables(spark, corpusDir)

  private def corpusVecs: DataFrame =
    tables.embeddings.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  private def recallOf(approx: DataFrame): Double = {
    val exact = Similarity.topkExact(tables).select("vec_id")
    exact.join(approx.select("vec_id"), "vec_id").count() / 10.0
  }

  test("Lloyd rounds strictly reduce distortion from the sampled init, and never increase it") {
    val init = AnnTraining.sampleInit(corpusVecs, "vec_id", "e", NClusters, "ivf")
    val d0 = AnnTraining.distortion(corpusVecs, "e", init)
    var prev = d0
    var cents = init
    for (i <- 1 to AnnTraining.TrainIters) {
      cents = AnnTraining.lloyd(corpusVecs, "e", cents, 1)
      val d = AnnTraining.distortion(corpusVecs, "e", cents)
      assert(d <= prev + 1e-9, s"round $i increased distortion: $prev -> $d")
      prev = d
    }
    assert(prev < d0, s"training never improved on the sampled init ($d0 -> $prev)")
  }

  test("trained IVF recalls the true neighbors where label-partition IVF cannot") {
    // nProbe=1 on 4 trained cells: the query's cell IS its cluster
    val trained = AnnTraining.ivfTrainedTopk(tables, nProbe = 1, nCells = NClusters)
    val rTrained = recallOf(trained)
    // label lists are geometry-blind: probing 1 of 10 labels sees ~1/10
    // of each cluster
    val rLabel = recallOf(Similarity.ivfTopk(tables, nProbe = 1))
    assert(rTrained >= rLabel,
      s"trained recall $rTrained < label-partition recall $rLabel at equal probe budget")
    assert(rTrained >= 0.8, s"trained quantizer missed its own cluster (recall $rTrained)")
  }

  test("trained PQ codebooks: recall at equal budget >= sampled, via the flag") {
    val sampled = recallOf(Similarity.pqAdc(tables))
    spark.conf.set(AnnTraining.TrainPqKey, "true")
    val trained =
      try recallOf(Similarity.pqAdc(tables))
      finally spark.conf.unset(AnnTraining.TrainPqKey)
    assert(trained >= sampled,
      s"trained PQ recall $trained < sampled $sampled at equal candidate budget")
  }

  test("codebook artifact: train-save-load round-trips; tampered artifacts fail loud") {
    import spark.implicits._
    val emb = tables.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val init = AnnTraining.sampleInit(emb, "vec_id", "e", 8, "art")
    val trained = AnnTraining.lloyd(emb, "e", init, 2)
    val dir = java.nio.file.Files.createTempDirectory("cbart").toString + "/cb"
    AnnTraining.saveCentroids(spark, trained, dir)
    val loaded = AnnTraining.loadCentroids(spark, dir)
    assert(loaded === trained)
    // assignment under the loaded book equals assignment under the trained one
    val a = AnnTraining.assign(emb, "e", trained).groupBy("__cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = AnnTraining.assign(emb, "e", loaded).groupBy("__cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a === b)
    // a cell gap fails loud; mixed dimensionality fails loud
    val gapDir = java.nio.file.Files.createTempDirectory("cbart").toString + "/gap"
    Seq((0, Seq(1.0, 2.0)), (2, Seq(3.0, 4.0))).toDF("cell", "vec").write.parquet(gapDir)
    assert(intercept[IllegalArgumentException](
      AnnTraining.loadCentroids(spark, gapDir)).getMessage.contains("gaps"))
    val mixDir = java.nio.file.Files.createTempDirectory("cbart").toString + "/mix"
    Seq((0, Seq(1.0, 2.0)), (1, Seq(3.0))).toDF("cell", "vec").write.parquet(mixDir)
    assert(intercept[IllegalArgumentException](
      AnnTraining.loadCentroids(spark, mixDir)).getMessage.contains("dimensionalities"))
  }

  test("per-subspace training reduces subvector quantization error") {
    val emb = tables.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val sub = Dim / 8
    val vsub = emb.select(slice(col("e"), 1, sub).as("vs"))
    val sample = AnnTraining.sampleInit(emb, "vec_id", "e", 16, "pq").map(_.slice(0, sub))
    val d0 = AnnTraining.distortion(vsub, "vs", sample)
    val trained = AnnTraining.lloyd(vsub, "vs", sample, AnnTraining.TrainIters)
    val d1 = AnnTraining.distortion(vsub, "vs", trained)
    assert(d1 <= d0 + 1e-9, s"subspace training increased distortion: $d0 -> $d1")
  }
}
