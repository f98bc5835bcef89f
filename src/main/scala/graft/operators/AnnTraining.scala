package graft.operators

import graft.functions.{Hashing, VectorOps}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/** k-means training for the ANN ladder (Lloyd 1982; the training step of
  * Jégou et al.'s IVF/PQ, TPAMI 2011) — expressed as Spark aggregates.
  *
  * Each Lloyd round is: one map pass assigning every vector to its
  * nearest centroid (an `array_min` over a LITERAL centroid array — no
  * join, no shuffle, the k×dim centroids ride the closure), and one
  * elementwise-mean aggregation (posexplode → groupBy(cell, pos)) whose
  * k×dim result is collected driver-side to seed the next round — the
  * same bounded-collect shape as the z-order bounds. At 100 TB this is
  * the standard pattern: train on the corpus (or a sample) in `iters`
  * linear passes, then ship the finished codebook as a build artifact.
  *
  * Training is deterministic: the init is the md5-ordered corpus sample
  * the UNTRAINED operators already use, so `distortion(lloyd(init)) ≤
  * distortion(init)` is guaranteed (Lloyd never increases distortion) and
  * results are stable across runs. The DuckDB oracles keep the sampled
  * (portable) variant; training activates behind
  * [[AnnTraining.TrainPqKey]] or via the explicit `*Trained` entry points.
  */
object AnnTraining {

  /** Set `true` to build the PQ codebooks in [[Similarity]] with
    * [[TrainIters]] Lloyd rounds instead of the raw md5 sample. Off by
    * default: the sampled variant is the oracle-portable one. */
  val TrainPqKey = "spark.graft.ann.trainPq"

  val TrainIters = 3

  /** Persist a trained codebook as a (cell, vec) parquet artifact —
    * "ship the finished codebook as a build artifact" made literal
    * (the [[graft.functions.Bpe.saveMerges]] convention: overwrite =
    * versioned-by-path, train once / assign everywhere). */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[Seq[Double]], path: String): Unit = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a codebook artifact back into the Seq[Seq[Double]] every
    * assignment/search entry point takes. Validates cell-id density and
    * uniform dimensionality, so a tampered or truncated artifact fails
    * LOUD instead of assigning against a different geometry than the
    * trainer produced. Bounded driver collect BY CONTRACT (k × dim). */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Seq[Double]] = {
    val rows = spark.read.parquet(path)
      .select(col("cell").cast("int"), col("vec"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
    val cells = rows.map(_._1)
    require(cells.distinct.length == rows.length,
      s"codebook artifact at $path repeats a cell id")
    require(rows.nonEmpty && cells.min == 0 && cells.max == rows.length - 1,
      s"codebook artifact at $path has gaps: cells must be exactly 0..${rows.length - 1}")
    val dims = rows.map(_._2.length).distinct
    require(dims.length == 1 && dims.head > 0,
      s"codebook artifact at $path mixes dimensionalities: ${dims.mkString(",")}")
    rows.sortBy(_._1).map(_._2).toSeq
  }

  // ------------------------------------------------------------ primitives

  /** `struct(d, cb_id)` of the nearest centroid per row — an `array_min`
    * over a literal array of centroids, so assignment is a pure map pass
    * (struct ordering compares `d` first, then `cb_id`: deterministic
    * ties). `vecCol` must be array<double>. */
  private def bestExpr(vecCol: String, cents: Seq[Seq[Double]]) = {
    val centArr = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).cast("int").as("cb_id"), array(c.map(lit): _*).as("c"))
    }: _*)
    element_at(array_sort(transform(centArr, x =>
      struct(
        aggregate(zip_with(col(vecCol), x.getField("c"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (s, v) => s + v).as("d"),
        x.getField("cb_id").as("cb_id")))), 1)
  }

  /** Rows with `__cell` (nearest centroid id) and `__d` (squared L2 to it). */
  private[graft] def assign(vecs: DataFrame, vecCol: String, cents: Seq[Seq[Double]]): DataFrame =
    vecs.withColumn("__best", bestExpr(vecCol, cents))
      .withColumn("__cell", col("__best.cb_id"))
      .withColumn("__d", col("__best.d"))
      .drop("__best")

  /** Mean squared distance to the nearest centroid — the k-means
    * objective; Lloyd rounds must never increase it. */
  def distortion(vecs: DataFrame, vecCol: String, cents: Seq[Seq[Double]]): Double =
    assign(vecs, vecCol, cents).agg(avg(col("__d"))).collect()(0).getDouble(0)

  /** Deterministic md5-ordered k-sample of `vecCol` — the same init the
    * untrained operators use as their whole codebook. */
  def sampleInit(vecs: DataFrame, idCol: String, vecCol: String, k: Int, tag: String): Seq[Seq[Double]] =
    vecs.select(col(vecCol), Hashing.md5Long(concat(lit(tag + ":"), col(idCol))).as("__h"), col(idCol))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect().toSeq.map(_.getSeq[Double](0).toSeq)

  /** `iters` Lloyd rounds from `init`. Empty cells keep their previous
    * centroid (the standard fix; distortion still never increases). */
  def lloyd(vecs: DataFrame, vecCol: String, init: Seq[Seq[Double]], iters: Int): Seq[Seq[Double]] = {
    var cents = init
    for (_ <- 0 until iters) {
      val means = assign(vecs, vecCol, cents)
        .select(col("__cell"), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
        .groupBy("__cell", "__pos")
        .agg(avg(col("__v")).as("__m"))
        .collect() // k × dim rows — bounded by the codebook size, not the corpus
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
    }
    cents
  }

  // ------------------------------------------------------------ trained PQ

  /** Per-subspace trained codebook `(s, cb_id, cs)` — the drop-in
    * replacement for [[Similarity]]'s sampled `csub`. Each subspace
    * starts from the SAME md5 sample the untrained codebook uses and
    * runs [[lloyd]], so its quantization error can only improve. */
  def pqCodebookSub(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, sub: Int, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    // the untrained codebook's sample: k full vectors, md5-ordered
    val sample = sampleInit(emb, idCol, vecCol, k, "pq")
    val rows = (0 until m).flatMap { s =>
      val vsub = emb.select(slice(col(vecCol), s * sub + 1, sub).as("__vs"))
      val init = sample.map(_.slice(s * sub, s * sub + sub))
      val trained = lloyd(vsub, "__vs", init, iters)
      trained.zipWithIndex.map { case (c, cbId) => Row(s, cbId, c) }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("s", IntegerType, nullable = false),
      StructField("cb_id", IntegerType, nullable = false),
      StructField("cs", org.apache.spark.sql.types.ArrayType(DoubleType), nullable = false))))
  }

  // ----------------------------------------------------------- trained IVF

  /** IVF top-k with a TRAINED coarse quantizer: k-means cells over the
    * corpus instead of the pre-existing `label` partitions. The win case
    * is a corpus whose labels don't align with its geometry — trained
    * cells follow the clusters, so the probed cells actually contain the
    * query's neighbors. At scale the learned cell id replaces `label` as
    * the partition key; everything downstream (partition-pruned probes,
    * IVFADC) is unchanged. */
  def ivfTrainedTopk(t: Tables, nProbe: Int, nCells: Int, k: Int = 10,
      iters: Int = TrainIters): DataFrame = {
    val spark = t.spark
    val corpus = t.embeddings.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"), col("embedding").cast("array<double>").as("__e"))
    val init = sampleInit(corpus, "vec_id", "__e", nCells, "ivf")
    val cents = lloyd(corpus, "__e", init, iters)
    // rank cells against the query driver-side: nCells dot products on
    // already-local centroids — pure math, no job
    val q = t.embeddings.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).collect()(0).getSeq[Double](0)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val probed = cents.zipWithIndex
      .map { case (c, i) => (cos(c, q), i) }
      .sortBy { case (s, i) => (-s, i) }
      .take(nProbe).map(_._2)
    val qv = t.embeddings.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    assign(corpus, "__e", cents)
      .filter(col("__cell").isin(probed: _*))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(VectorOps.cosineBest(spark)(col("embedding"), col("qv")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
