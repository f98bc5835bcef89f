package graft

import graft.operators.QualityChecks
import java.sql.Timestamp

/** NULLs must count as violations — three-valued logic would otherwise
  * certify a corrupt batch as clean (every check passes vacuously). */
class QualityChecksSpec extends SparkSpec {

  test("NULL fields register as violations in every predicate check") {
    import spark.implicits._
    val orders = Seq(
      // (orderkey, custkey, status, totalprice, orderdate)
      (1L, Option(10L), Option("O"), Option(100.0), Option(Timestamp.valueOf("1995-06-01 00:00:00"))),
      (2L, None, None, None, None), // all-NULL row: 4 predicate violations + null custkey
      (2L, Option(10L), Option("X"), Option(-5.0), Option(Timestamp.valueOf("2020-01-01 00:00:00"))) // dup key + 3 violations
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val customer = Seq(Tuple1(10L)).toDF("c_custkey")
    val r = QualityChecks.ordersChecksOn(orders, customer).collect()
      .map(row => row.getAs[String]("check_name") -> row.getAs[Long]("violations")).toMap
    assert(r("not_null_custkey") == 1)
    assert(r("unique_orderkey") == 1)
    assert(r("positive_totalprice") == 2) // NULL + negative
    assert(r("status_domain") == 2)       // NULL + 'X'
    assert(r("orderdate_range") == 2)     // NULL + 2020
    assert(r("ref_custkey_exists") == 1)  // the NULL custkey row can't resolve
  }
}
