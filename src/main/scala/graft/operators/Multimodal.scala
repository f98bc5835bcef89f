package graft.operators

import graft.QueryDef
import graft.functions.Hashing
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, plus batched feature extraction.
  *
  * The real decode step (image/audio libs) is STUBBED — this environment
  * has no codecs — as a deterministic fake keyed off the payload bytes.
  * What is real, and what matters at 100 TB, is the Spark-side plumbing:
  * binary columns flowing through parquet, metadata derived with native
  * expressions, and per-partition *batched* processing (`mapPartitions`
  * over grouped iterators — the Scala analog of `mapInPandas` batches)
  * so a vectorized decoder amortizes model/codec setup per batch instead
  * of per row, without materializing a partition in memory.
  */
object Multimodal {

  /** Synthesize the binary payload column (documents.text as UTF-8 bytes —
    * stand-in for image/audio blobs). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Metadata extraction over the binary column: size, checksum, and
    * decoded media dimensions (the decode being the deterministic stub). */
  def metadata(t: Tables): DataFrame = {
    val d = withPayload(t.documents)
    val checksum = md5(col("payload"))
    d.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("byte_len"),
      checksum.as("checksum"),
      (Hashing.md5Long(concat(lit("w:"), checksum)) % 640 + 1).as("width"),
      (Hashing.md5Long(concat(lit("h:"), checksum)) % 480 + 1).as("height"),
      (Hashing.md5Long(concat(lit("f:"), checksum)) % 30 + 1).as("n_frames")
    ).orderBy("doc_id")
  }

  // DuckDB's md5() takes VARCHAR only; md5 of the UTF-8 text equals md5 of
  // the UTF-8-encoded payload bytes, so the mirror hashes the text directly.
  private val metadataSql =
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS byte_len,
       |  md5(text) AS checksum,
       |  ${Hashing.sqlMd5Long("concat('w:', md5(text))")} % 640 + 1 AS width,
       |  ${Hashing.sqlMd5Long("concat('h:', md5(text))")} % 480 + 1 AS height,
       |  ${Hashing.sqlMd5Long("concat('f:', md5(text))")} % 30 + 1 AS n_frames
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Stub "decoder": a fixed-width feature vector from payload bytes.
    * Replace with a real codec + model in production — the signature
    * (bytes in, float features out, batched) is the contract. */
  private[graft] def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val n = payload.length.max(1)
    val mean = payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toFloat / n
    Array(
      n.toFloat,
      mean,
      (payload.headOption.getOrElse(0: Byte) & 0xff).toFloat,
      (payload.lastOption.getOrElse(0: Byte) & 0xff).toFloat
    )
  }

  private val featuresSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  /** Batched feature extraction: partitions stream through in batches of
    * 64 rows (decoder setup amortized per batch, bounded memory). */
  def features(t: Tables): DataFrame = {
    val d = withPayload(t.documents).select(col("doc_id"), col("payload"))
    val spark = t.spark
    val encoder = org.apache.spark.sql.Encoders.row(featuresSchema)
    d.mapPartitions { rows =>
      rows.grouped(64).flatMap { batch =>
        // per-batch decoder init would go here (model load, codec ctx)
        batch.map { r =>
          Row(r.getLong(0), fakeDecode(r.getAs[Array[Byte]](1)).toSeq)
        }
      }
    }(encoder).orderBy("doc_id")
  }

  /** Comparator-safe projection of [[features]]: the feature vector
    * flattened to f0..f3 scalar doubles. The driver's rows-only check
    * pandas-sorts every output column and cannot sort an `array<float>`
    * cell, so the registered query emits scalars; the batched
    * bytes-in/vector-out contract stays in [[features]]. */
  def featuresFlat(t: Tables): DataFrame =
    features(t).select(
      col("doc_id") +: (0 until 4).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i")): _*)

  // SQL mirror of [[fakeDecode]] over the UTF-8 payload. Requires an
  // ASCII corpus so per-char code points ARE the payload bytes — and
  // ENFORCES it: a non-ASCII row makes the oracle raise via error()
  // instead of silently diverging (also asserted in OperatorSmokeSpec).
  // FLOAT casts keep the mean in float32 arithmetic bit-for-bit with the
  // JVM's `sum.toFloat / n` (verified exact on all 500 sf0.01 docs).
  private val featuresSql =
    """SELECT doc_id,
      |  CAST(CAST(greatest(CASE WHEN octet_length(encode(text)) <> length(text)
      |                          THEN error('non-ASCII doc: mm_features oracle assumes byte==char')
      |                          ELSE length(text) END, 1) AS FLOAT) AS DOUBLE) AS f0,
      |  CASE WHEN length(text)=0 THEN 0.0
      |       ELSE CAST(CAST(CAST(list_aggregate(list_transform(split(text,''), c -> unicode(c)), 'sum') AS FLOAT)
      |                 / CAST(length(text) AS FLOAT) AS FLOAT) AS DOUBLE) END AS f1,
      |  CASE WHEN length(text)=0 THEN 0.0
      |       ELSE CAST(CAST(unicode(substr(text,1,1)) AS FLOAT) AS DOUBLE) END AS f2,
      |  CASE WHEN length(text)=0 THEN 0.0
      |       ELSE CAST(CAST(unicode(substr(text,length(text),1)) AS FLOAT) AS DOUBLE) END AS f3
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Resize planning: fit each decoded image into a 224-box preserving
    * aspect ratio — pure integer arithmetic on the metadata (the actual
    * pixel resample belongs in the stubbed decoder); no shuffle. */
  def resizePlan(t: Tables): DataFrame =
    metadata(t)
      .select(
        col("doc_id"), col("width"), col("height"),
        greatest(lit(1L), expr("(width * 224) div greatest(width, height)")).as("out_w"),
        greatest(lit(1L), expr("(height * 224) div greatest(width, height)")).as("out_h"))
      .orderBy("doc_id")

  private val resizePlanSql =
    s"""SELECT doc_id, width, height,
       |  greatest(1, (width * 224) // greatest(width, height)) AS out_w,
       |  greatest(1, (height * 224) // greatest(width, height)) AS out_h
       |FROM (
       |  SELECT doc_id,
       |    ${Hashing.sqlMd5Long("concat('w:', md5(text))")} % 640 + 1 AS width,
       |    ${Hashing.sqlMd5Long("concat('h:', md5(text))")} % 480 + 1 AS height
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Frame sampling: every 5th frame index per clip — the row-explosion
    * shape of video pipelines (rows multiply by frames/stride, so the
    * shuffle budget is decided here, before any decode). */
  def frameSample(t: Tables): DataFrame =
    metadata(t)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(5L))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  private val frameSampleSql =
    s"""SELECT doc_id, unnest(range(0, n_frames, 5)) AS frame_idx
       |FROM (
       |  SELECT doc_id, ${Hashing.sqlMd5Long("concat('f:', md5(text))")} % 30 + 1 AS n_frames
       |  FROM documents)
       |ORDER BY doc_id, frame_idx""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("mm_metadata", metadata, Some(metadataSql)),
    QueryDef("mm_resize_plan", resizePlan, Some(resizePlanSql)),
    QueryDef("mm_frame_sample", frameSample, Some(frameSampleSql)),
    QueryDef("mm_features", featuresFlat, Some(featuresSql))
  )
}
