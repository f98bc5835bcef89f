package graft

import graft.operators.Etl
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Pack-bucket fan-out contract for `etl_pack_sequences`: the bucket is
  * a doc_id HASH honored from `spark.graft.etl.packBuckets` — a modulo
  * bucket is constant within every fixture stratum (source/lang are
  * assigned BY a doc_id modulus), which silently disabled the window
  * fan-out the scale design depends on. */
class EtlPackSpec extends SparkSpec {

  test("etl_pack_sequences hash bucket fans out WITHIN strata and honors the conf") {
    val t = Tables(spark, sf0001)
    def packs() = Etl.packSequences(t)
      .select("doc_id", "bucket", "pack_id", "pack_offset").collect().toSet
    val at4 = packs()
    // the fixture's modulo-assigned sources made `doc_id % N` constant
    // per stratum; the HASH bucket must genuinely split strata
    val maxBucketsInStratum = Etl.packSequences(t)
      .groupBy("source", "lang").agg(countDistinct("bucket").as("nb"))
      .agg(max("nb")).head().getLong(0)
    assert(maxBucketsInStratum > 1L,
      s"hash bucket must fan out within a stratum, got max $maxBucketsInStratum")
    try {
      spark.conf.set(Etl.PackBucketsConf, "1")
      assert(packs() !== at4, "a different bucket fan-out must change pack assignment")
      spark.conf.set(Etl.PackBucketsConf, "0")
      intercept[IllegalArgumentException](Etl.packSequences(t).collect())
    } finally spark.conf.unset(Etl.PackBucketsConf)
  }
}
