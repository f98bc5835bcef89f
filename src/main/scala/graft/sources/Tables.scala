package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed row models for the tables where compile-time safety pays off. */
object Models {
  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp, o_orderpriority: String)
  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
}

/** Loaders for the benchmark tables under a scale-factor directory.
  *
  * Plain parquet reads — schema comes from the files so Catalyst can prune
  * columns and push filters into the scan. At cluster scale these would be
  * catalog tables partitioned/bucketed by their natural keys; the query code
  * is agnostic to that.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Typed views (Dataset[T]) for operators that want case-class rows. */
  def customerDs: org.apache.spark.sql.Dataset[Models.Customer] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Models.Customer]
    customer.as[Models.Customer]
  }
  def ordersDs: org.apache.spark.sql.Dataset[Models.Order] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Models.Order]
    orders.as[Models.Order]
  }
  def documentsDs: org.apache.spark.sql.Dataset[Models.Document] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Models.Document]
    documents.as[Models.Document]
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set by [[graft.GraftSession]] and the driver mains) it surfaces as a
    * long nanos-since-epoch; convert to a microsecond timestamp here —
    * flooring division, matching how DuckDB truncates ns → µs. */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: double division loses µs precision on
        // ~2^60 nanosecond values (53-bit mantissa)
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
}
