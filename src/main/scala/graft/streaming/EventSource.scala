package graft.streaming

import graft.sources.AvroCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable ingestion seam for the streaming pipeline: every source
  * yields the canonical event frame (`event_id` long, `ts` timestamp,
  * `user_id` long, `event_type` string, `value` double), so the
  * transformations in [[EventStream]] never know where rows came from and
  * swapping Kafka in on a cluster is a CONFIG change, not a code edit
  * (reference: pipeline/data_ingestion/spark_structured_datastream.py:56-62
  * reads Kafka inline — here that wiring is one implementation of this
  * trait).
  *
  * This environment ships no Kafka broker or connector jar, so
  * [[KafkaEventSource.load]] cannot start here; its two halves are split
  * exactly so everything BUT the socket is still tested offline: the
  * reader `options` map is plain data, and [[KafkaEventSource.project]]
  * is a pure DataFrame → DataFrame function exercised in the spec against
  * batch rows shaped like Kafka's wire schema carrying real
  * Confluent-framed Avro payloads.
  */
trait EventSource {
  /** The (possibly streaming) canonical event frame. */
  def load(spark: SparkSession): DataFrame
}

/** Deterministic synthetic stream ([[EventStream.fakeEvents]]) — the
  * reference's fake-data producer without the broker. */
final case class RateEventSource(rowsPerBatch: Int = 100) extends EventSource {
  def load(spark: SparkSession): DataFrame = EventStream.fakeEvents(spark, rowsPerBatch)
}

/** File-backed stream: picks up parquet drops in `dir` (the landing-zone
  * pattern); schema must be supplied — streaming reads don't infer. */
final case class FileEventSource(dir: String, schema: org.apache.spark.sql.types.StructType)
    extends EventSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
}

/** The production source: Kafka topic of Confluent-framed Avro events.
  *
  * `maxOffsetsPerTrigger` is the backpressure cap — without it the first
  * micro-batch after a restart reads the whole retention window in one
  * gulp and blows executor memory at fleet scale. `failOnDataLoss=false`
  * because retention-expired offsets on a lagging restart are an
  * operational fact, not a query error.
  */
final case class KafkaEventSource(bootstrapServers: String, topic: String,
    startingOffsets: String = "earliest", maxOffsetsPerTrigger: Long = 1000000L)
    extends EventSource {

  /** The exact option map `readStream.format("kafka")` receives. */
  def options: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets,
    "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString,
    "failOnDataLoss" -> "false")

  /** Kafka wire rows (`value` binary, plus key/topic/partition/offset/…) →
    * canonical events: Confluent-frame Avro decode + µs-timestamp
    * restoration. Pure projection — identical for batch and streaming
    * frames, which is how the spec verifies it without a broker. */
  def project(kafkaRows: DataFrame): DataFrame =
    AvroCodec.decode(kafkaRows.select(col("value").as("frame")))
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))

  def load(spark: SparkSession): DataFrame =
    project(spark.readStream.format("kafka").options(options).load())
}
