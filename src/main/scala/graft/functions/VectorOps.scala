package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` columns, built from
  * catalyst higher-order functions (zip_with/aggregate) — distributed,
  * null-safe, and with no UDF serialization boundary.
  *
  * Arithmetic is done in double precision with left-to-right accumulation,
  * matching DuckDB's `list_cosine_similarity` closely enough that
  * `round(…, 4)` outputs agree (thresholds in callers keep ≥1e-4 margins
  * from any data point).
  */
object VectorOps {

  /** Dot product of two float-array columns (double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** try_divide, not `/`: under Spark 4's default ANSI mode a zero-norm or
    * empty vector would otherwise throw DIVIDE_BY_ZERO; try_divide yields
    * null in both ANSI modes, matching [[graft.plans.VectorCosine]]. */
  def cosine(a: Column, b: Column): Column = try_divide(dot(a, b), norm(a) * norm(b))

  /** Cosine via the native codegen expression when the session has
    * [[graft.plans.GraftExtensions]] registered, else the HOF fallback.
    * Both accumulate identically, so results are bit-equal. */
  def cosineBest(spark: org.apache.spark.sql.SparkSession)(a: Column, b: Column): Column =
    if (spark.catalog.functionExists("vector_cosine")) call_function("vector_cosine", a, b)
    else cosine(a, b)

  /** Sign-bit LSH bucket from the first `nBits` components: bit i set iff
    * component i ≥ 0. Random-hyperplane LSH with axis-aligned planes —
    * deterministic, partition-prunable, and oracle-mirrorable. */
  def signBucket(a: Column, nBits: Int): Column =
    (0 until nBits)
      .map(i => when(a.getItem(i) >= 0f, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** DuckDB mirror of [[signBucket]] (1-indexed lists). */
  def sqlSignBucket(expr: String, nBits: Int): String =
    (0 until nBits)
      .map(i => s"CASE WHEN $expr[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END")
      .mkString("(", " + ", ")")
}
