package graft

import graft.functions.Hashing
import org.apache.spark.sql.functions._

class HashingSpec extends SparkSpec {

  test("md5Long matches the DuckDB-computed reference value") {
    import spark.implicits._
    // DuckDB: SELECT CAST(concat('0x', substr(md5('hello'),1,15)) AS BIGINT)
    val v = Seq("hello").toDF("s").select(Hashing.md5Long(col("s"))).collect()(0).getLong(0)
    assert(v == 419982666956583591L)
  }

  test("salted variants are independent and deterministic") {
    import spark.implicits._
    val d = Seq("x").toDF("s")
    val a = d.select(Hashing.md5Long(col("s"), 0)).collect()(0).getLong(0)
    val b = d.select(Hashing.md5Long(col("s"), 1)).collect()(0).getLong(0)
    val a2 = d.select(Hashing.md5Long(col("s"), 0)).collect()(0).getLong(0)
    assert(a != b && a == a2 && a >= 0 && b >= 0)
  }
}
