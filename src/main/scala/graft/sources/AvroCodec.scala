package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** Confluent-framed Avro encode/decode for event records — the wire format
  * the reference's Kafka producer emits (magic byte 0x00 + 4-byte
  * schema-registry id + Avro binary body; reference:
  * pipeline/data_ingestion/kafka_producer/produce_fake_data.py:92-118).
  *
  * Built on the Avro core library via `mapPartitions`: writer/reader and
  * the reused encoder/decoder are constructed once per partition, so the
  * per-record cost is just the serialization itself — the batched-codec
  * pattern that holds at any scale. With a Kafka cluster attached, these
  * frames are exactly what `writeStream.format("kafka")` would carry.
  */
object AvroCodec {

  val EventSchemaJson: String =
    """{"type":"record","name":"Event","namespace":"graft","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"ts_us","type":"long"},
      |{"name":"user_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"}
      |]}""".stripMargin

  private val MagicByte: Byte = 0x00

  /** Encode (event_id, ts, user_id, event_type, value) rows to Confluent
    * frames: output (event_id, frame binary). */
  def encode(events: DataFrame, schemaId: Int = 1): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = Encoders.row(outSchema)
    events
      .selectExpr("event_id", "unix_micros(ts) AS ts_us", "user_id", "event_type", "value")
      .mapPartitions { rows =>
        val schema = new Schema.Parser().parse(EventSchemaJson)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        var encoder: BinaryEncoder = null
        rows.map { r =>
          val rec = new GenericData.Record(schema)
          rec.put("event_id", r.getLong(0))
          rec.put("ts_us", r.getLong(1))
          rec.put("user_id", r.getLong(2))
          rec.put("event_type", r.getString(3))
          rec.put("value", r.getDouble(4))
          val bos = new ByteArrayOutputStream()
          bos.write(MagicByte.toInt)
          bos.write(ByteBuffer.allocate(4).putInt(schemaId).array())
          encoder = EncoderFactory.get().binaryEncoder(bos, encoder)
          writer.write(rec, encoder)
          encoder.flush()
          Row(r.getLong(0), bos.toByteArray)
        }
      }(enc)
  }

  /** Decode Confluent frames back to typed event rows. */
  def decode(frames: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts_us", LongType, nullable = false),
      StructField("user_id", LongType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    val enc = Encoders.row(outSchema)
    frames.select("frame").mapPartitions { rows =>
      val schema = new Schema.Parser().parse(EventSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decoder: BinaryDecoder = null
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](0)
        require(bytes.length > 5 && bytes(0) == MagicByte,
          s"not a Confluent-framed Avro message (len=${bytes.length})")
        decoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, decoder)
        val rec = reader.read(null, decoder)
        Row(
          rec.get("event_id").asInstanceOf[Long],
          rec.get("ts_us").asInstanceOf[Long],
          rec.get("user_id").asInstanceOf[Long],
          rec.get("event_type").toString,
          rec.get("value").asInstanceOf[Double])
      }
    }(enc)
  }
}
