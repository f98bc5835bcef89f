package graft

import graft.sources.{AvroCodec, Tables}

class AvroCodecSpec extends SparkSpec {

  test("Confluent-framed Avro round-trip preserves every event") {
    val ev = Tables(spark, sf0001).events.limit(200)
    val decoded = AvroCodec.decode(AvroCodec.encode(ev, schemaId = 7))
    val orig = ev.selectExpr("event_id", "unix_micros(ts) AS ts_us", "user_id", "event_type", "value")
      .collect().map(_.toSeq).toSet
    val round = decoded.collect().map(_.toSeq).toSet
    assert(round == orig && round.size == 200)
  }

  test("frame layout: magic byte + big-endian schema id prefix") {
    val ev = Tables(spark, sf0001).events.limit(1)
    val frame = AvroCodec.encode(ev, schemaId = 259).collect()(0).getAs[Array[Byte]]("frame")
    assert(frame(0) == 0x00)
    val id = java.nio.ByteBuffer.wrap(frame, 1, 4).getInt
    assert(id == 259)
  }

  test("decode rejects unframed payloads") {
    import spark.implicits._
    val bad = Seq(Tuple1(Array[Byte](1, 2, 3, 4, 5, 6))).toDF("frame")
    val e = intercept[org.apache.spark.SparkException] {
      AvroCodec.decode(bad).collect()
    }
    assert(e.getMessage.contains("Confluent") ||
      Option(e.getCause).exists(_.getMessage.contains("Confluent")))
  }

  test("deterministic fake event stream emits typed rows per batch") {
    val stream = graft.streaming.EventStream.fakeEvents(spark, rowsPerBatch = 50)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("fake")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    try q.awaitTermination(30000) finally q.stop()
    val rows = spark.table("fake")
    assert(rows.count() == 50)
    val types = rows.select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("click", "view", "purchase", "signup", "error")))
  }
}
