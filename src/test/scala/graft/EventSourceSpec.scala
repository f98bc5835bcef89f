package graft

import graft.sources.AvroCodec
import graft.streaming.{EventStream, KafkaEventSource, RateEventSource}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The ingestion seam: each EventSource yields the canonical event frame.
  * Kafka's socket half can't run here (no broker/connector jar); its
  * option map and wire-row projection — everything but the socket — are
  * verified against batch rows shaped like Kafka's output schema carrying
  * real Confluent-framed Avro payloads. */
class EventSourceSpec extends SparkSpec {

  test("kafka reader options carry subscription, backpressure cap, and loss tolerance") {
    val opts = KafkaEventSource("broker-0:9092,broker-1:9092", "events", "latest", 250000L).options
    assert(opts("kafka.bootstrap.servers") == "broker-0:9092,broker-1:9092")
    assert(opts("subscribe") == "events")
    assert(opts("startingOffsets") == "latest")
    assert(opts("maxOffsetsPerTrigger") == "250000")
    assert(opts("failOnDataLoss") == "false")
  }

  test("kafka wire-row projection decodes Confluent frames to canonical events") {
    import spark.implicits._
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click", 1.25),
      (2L, Timestamp.valueOf("2024-01-01 10:05:00"), 8L, "purchase", 99.99))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // shape rows like the kafka source's output schema: binary value + wire metadata
    val wire = AvroCodec.encode(events, schemaId = 7).select(
      lit(null).cast("binary").as("key"), col("frame").as("value"),
      lit("events").as("topic"), lit(0).as("partition"),
      col("event_id").as("offset"), current_timestamp().as("timestamp"),
      lit(0).as("timestampType"))
    val out = KafkaEventSource("b:9092", "events").project(wire)
      .orderBy("event_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Timestamp]("ts") == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(out(1).getString(3) == "purchase" && out(1).getDouble(4) == 99.99)
  }

  test("rate source streams the canonical schema") {
    val df = RateEventSource(10).load(spark)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq == Seq("event_id", "ts", "user_id", "event_type", "value"))
  }

  test("canonical frame feeds EventStream transforms unchanged") {
    // the seam's contract: any source's output drops into the transforms
    val df = RateEventSource(10).load(spark)
    assert(EventStream.windowCounts(df).isStreaming)
  }
}
