package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiler — the deequ `ColumnProfilerRunner` capability from the
  * reference (reference: pipeline/data_profiling.py:46) rebuilt as a single
  * declarative aggregation.
  *
  * Scale: ONE scan of the table computes every column's stats (count,
  * nulls, distinct, min/max, mean) in a single `agg`; the multi-distinct is
  * planned by Catalyst via Expand (still one pass over the data, ~#cols×
  * rows intermediate, map-side partial aggregation). Naive per-column jobs
  * — what pydeequ does under the hood for some metrics — would be #cols
  * scans of 100 TB. For trillion-row tables swap `count_distinct` for
  * `approx_count_distinct` (HLL, no Expand): `profile(df, approx = true)`;
  * the exact variant is what the oracle checks.
  */
object Profiler {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** Long-format profile: one row per column of `df`.
    *
    * Three global aggregates crossJoined (each 1 row), not one. A single
    * aggregate mixing multi-`count_distinct` (which rewrites to an
    * Expand ×#cols) with min/max/mean buffers does two fatal things:
    * string min/max buffers are not UnsafeRow-mutable, degrading the whole
    * Expand phase to a SortAggregate that sorts the widened fact (measured
    * 70+ s at sf0.1); and input-cols + ~60 buffers exceed
    * `spark.sql.codegen.maxFields`, kicking the operator out of
    * whole-stage codegen. Split, every phase stays codegen'd:
    *  - plain stats (count/nulls/min/max/mean/stddev, mutable buffers
    *    only): one streaming HashAggregate, no Expand;
    *  - distinct counts for all columns: the Expand path, but narrow —
    *    grouping keys + 1 count buffer per column;
    *  - string min/max: a global no-grouping SortAggregate (streams, no
    *    sort) over a scan pruned to just the string columns.
    * Measured 14 s → ~1.5 s at sf0.1; each aggregate's scan prunes to the
    * columns it needs, so total IO stays ~2 column-disjoint scans. */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toIndexedSeq
    def nd(c: Column): Column = if (approx) approx_count_distinct(c) else count_distinct(c)
    def isString(dt: DataType): Boolean = dt.isInstanceOf[StringType]
    val statAggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(lit(1)).as(s"${f.name}__n_rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__n_nulls"))
      val typed =
        if (isNumeric(f.dataType)) Seq(
          // via double so integer columns render as '7.0' like the oracle
          round(min(c).cast("double"), 4).cast("string").as(s"${f.name}__min"),
          round(max(c).cast("double"), 4).cast("string").as(s"${f.name}__max"),
          round(avg(c.cast("double")), 4).as(s"${f.name}__mean"),
          round(stddev_samp(c.cast("double")), 4).as(s"${f.name}__stddev"))
        else if (!isString(f.dataType)) Seq( // timestamp/date: long buffer, mutable
          min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max"))
        else Seq.empty
      base ++ typed
    }
    val distinctAggs: Seq[Column] =
      fields.map(f => nd(col(f.name)).as(s"${f.name}__n_distinct"))
    val stringAggs: Seq[Column] = fields.filter(f => isString(f.dataType)).flatMap { f =>
      val c = col(f.name)
      Seq(min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    }
    val joined = {
      val base = df.agg(statAggs.head, statAggs.tail: _*)
        .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
      if (stringAggs.isEmpty) base
      else base.crossJoin(df.agg(stringAggs.head, stringAggs.tail: _*))
    }
    val structs = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col(s"${f.name}__n_rows").as("n_rows"),
        col(s"${f.name}__n_nulls").as("n_nulls"),
        col(s"${f.name}__n_distinct").as("n_distinct"),
        col(s"${f.name}__min").as("min_value"),
        col(s"${f.name}__max").as("max_value"),
        (if (isNumeric(f.dataType)) col(s"${f.name}__mean")
         else lit(null).cast("double")).as("mean"),
        (if (isNumeric(f.dataType)) col(s"${f.name}__stddev")
         else lit(null).cast("double")).as("stddev"))
    }
    joined
      .select(explode(array(structs: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }

  def profileLineitem(t: Tables): DataFrame = profile(t.lineitem)

  /** DuckDB mirror: one UNION ALL branch per column. */
  private def branch(column: String, numeric: Boolean, table: String): String = {
    val minMax =
      if (numeric) s"CAST(round(CAST(min($column) AS DOUBLE),4) AS VARCHAR) AS min_value, CAST(round(CAST(max($column) AS DOUBLE),4) AS VARCHAR) AS max_value"
      else s"CAST(min($column) AS VARCHAR) AS min_value, CAST(max($column) AS VARCHAR) AS max_value"
    val mean =
      if (numeric)
        s"round(avg(CAST($column AS DOUBLE)),4) AS mean, round(stddev_samp(CAST($column AS DOUBLE)),4) AS stddev"
      else "CAST(NULL AS DOUBLE) AS mean, CAST(NULL AS DOUBLE) AS stddev"
    // CAST AS BIGINT: DuckDB sum() over INTEGER yields HUGEINT → float64 in
    // the comparator's pandas fetch ('0.0' vs Spark's '0')
    s"""SELECT '$column' AS col_name, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN $column IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |  count(DISTINCT $column) AS n_distinct, $minMax, $mean
       |FROM $table""".stripMargin
  }

  private val lineitemNumeric = Seq(
    "l_orderkey" -> true, "l_partkey" -> true, "l_suppkey" -> true,
    "l_linenumber" -> true, "l_quantity" -> true, "l_extendedprice" -> true,
    "l_discount" -> true, "l_tax" -> true, "l_returnflag" -> false,
    "l_linestatus" -> false, "l_shipdate" -> false)

  private val profileLineitemSql =
    lineitemNumeric.map { case (c, num) => branch(c, num, "lineitem") }
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Value histogram for low-cardinality columns (deequ's histogram
    * metric): one shuffle keyed on (column, value). */
  def histogram(t: Tables): DataFrame = {
    val o = t.orders
    Seq("o_orderstatus", "o_orderpriority")
      .map(c => o.groupBy(lit(c).as("col_name"), col(c).as("value"))
        .agg(count(lit(1)).as("n")))
      .reduce(_ union _)
      .orderBy("col_name", "value")
  }

  private val histogramSql =
    """SELECT 'o_orderstatus' AS col_name, o_orderstatus AS value, count(*) AS n
      |FROM orders GROUP BY o_orderstatus
      |UNION ALL
      |SELECT 'o_orderpriority', o_orderpriority, count(*) FROM orders GROUP BY o_orderpriority
      |ORDER BY col_name, value""".stripMargin

  /** Pairwise Pearson correlations between lineitem measures — one scan,
    * all pairs in a single aggregate. */
  def correlations(t: Tables): DataFrame = {
    val pairs = Seq(
      ("l_quantity", "l_extendedprice"),
      ("l_extendedprice", "l_discount"),
      ("l_discount", "l_tax"))
    val aggs = pairs.map { case (a, b) => round(corr(col(a), col(b)), 4).as(s"${a}__$b") }
    t.lineitem.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"), col(s"${a}__$b").as("pearson_r"))
      }: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_a", "col_b")
  }

  private val correlationsSql =
    """SELECT col_a, col_b, pearson_r FROM (
      |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
      |         round(corr(l_quantity, l_extendedprice), 4) AS pearson_r FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice', 'l_discount', round(corr(l_extendedprice, l_discount), 4) FROM lineitem
      |  UNION ALL
      |  SELECT 'l_discount', 'l_tax', round(corr(l_discount, l_tax), 4) FROM lineitem)
      |ORDER BY col_a, col_b""".stripMargin

  /** Heavy hitters: the top-10 most frequent join keys in the fact table —
    * the skew report that decides when salting is needed. */
  def heavyHitters(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // orderBy+limit compiles to TakeOrderedAndProject (per-partition
    // top-k, driver merge of 10-row heaps) — a global-ordering window
    // here would funnel every distinct key through one task; the rank
    // window then runs on just 10 rows
    val top10 = t.lineitem.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_orderkey"))
      .limit(10)
    top10
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n").desc, col("l_orderkey"))))
      .select(col("l_orderkey"), col("n"), col("rnk"))
      .orderBy("rnk")
  }

  private val heavyHittersSql =
    """SELECT l_orderkey, n, rnk FROM (
      |  SELECT l_orderkey, n, row_number() OVER (ORDER BY n DESC, l_orderkey) AS rnk
      |  FROM (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey))
      |WHERE rnk <= 10 ORDER BY rnk""".stripMargin

  /** Mergeable count-min sketch over a long key column (Cormode &
    * Muthukrishnan, J. Algorithms 2005) via Spark's `count_min_sketch`
    * aggregate: each partition builds a fixed-size sketch, sketches merge
    * associatively (the shuffle carries one ~eps⁻¹-cell array per
    * partition, never per-key rows), and estimates obey
    * exact ≤ est ≤ exact + ε·n with probability ≥ confidence — the
    * approximate heavy-hitter path when exact per-key counts would
    * shuffle the corpus. Deterministic under a fixed seed. */
  def cmsEstimates(df: DataFrame, keyCol: String, probes: Seq[Long],
      eps: Double = 0.001, confidence: Double = 0.99): Map[Long, Long] = {
    val bytes = df
      .select(expr(s"count_min_sketch($keyCol, ${eps}d, ${confidence}d, 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    probes.map(p => p -> cms.estimateCount(java.lang.Long.valueOf(p))).toMap
  }

  /** Distribution-drift monitor: Population Stability Index between the
    * first and second half of the event stream (split at 2024-01-15), per
    * bucket, over two dimensions at once — the categorical event_type and
    * a fixed-width value histogram. PSI is the standard "did the
    * upstream's distribution move?" gate a production pipeline runs before
    * trusting a new ingest (psi_term sums ≥ 0.2 over a dimension = major
    * shift). Counts are Laplace-smoothed (+0.5) so a bucket emptying out
    * on one side yields a large finite term, not ±∞.
    *
    * Scale: ONE scan — both dimensions ride a 2-way in-map explode, both
    * windows are conditional sums in the same aggregate (no per-window
    * scans, no join of two filtered reads); the per-dimension totals join
    * is on a ≤2-row broadcast side. */
  def driftPsi(t: Tables): DataFrame = {
    val split = lit("2024-01-15").cast("timestamp")
    val rows = t.events
      // a null timestamp has UNKNOWN window membership — (ts < split) is
      // null and the otherwise() branch would silently count it as
      // post-split, inflating q across every bucket (a parsing break
      // upstream would read as corpus-wide drift). Exclude, don't guess.
      // A null value is excluded for the same reason: its histogram bucket
      // is undefined (and engines disagree on concat-with-null — Spark
      // yields NULL, DuckDB skips the null — so guessing also breaks the
      // oracle compare).
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(explode(array(
        struct(lit("event_type").as("dim"), col("event_type").as("bucket")),
        struct(lit("value_bucket").as("dim"),
          concat(lit("b"), floor(col("value") / 25.0).cast("long")).as("bucket")))).as("db"),
        (col("ts") < split).as("in_a"))
      .select(col("db.dim").as("dim"), col("db.bucket").as("bucket"), col("in_a"))
    val counts = rows.groupBy(col("dim"), col("bucket"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("cb"))
    val totals = counts.groupBy(col("dim"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"), count(lit(1)).as("k"))
    counts.join(broadcast(totals), "dim")
      .withColumn("p", (col("ca") + 0.5) / (col("na") + lit(0.5) * col("k")))
      .withColumn("q", (col("cb") + 0.5) / (col("nb") + lit(0.5) * col("k")))
      .select(col("dim"), col("bucket"),
        round(col("p"), 4).as("p"), round(col("q"), 4).as("q"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 4).as("psi_term"))
      .orderBy("dim", "bucket")
  }

  private val driftPsiSql =
    """WITH rows AS (
      |  SELECT 'event_type' AS dim, event_type AS bucket,
      |         (ts < TIMESTAMP '2024-01-15') AS in_a FROM events
      |  WHERE ts IS NOT NULL AND value IS NOT NULL
      |  UNION ALL
      |  SELECT 'value_bucket', concat('b', CAST(floor(value/25.0) AS BIGINT)),
      |         ts < TIMESTAMP '2024-01-15' FROM events
      |  WHERE ts IS NOT NULL AND value IS NOT NULL),
      |counts AS (
      |  SELECT dim, bucket,
      |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM rows GROUP BY 1, 2),
      |tot AS (SELECT dim, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
      |               count(*) AS k FROM counts GROUP BY 1)
      |SELECT dim, bucket,
      |  round((ca+0.5)/(na+0.5*k), 4) AS p,
      |  round((cb+0.5)/(nb+0.5*k), 4) AS q,
      |  round(((ca+0.5)/(na+0.5*k) - (cb+0.5)/(nb+0.5*k))
      |        * ln(((ca+0.5)/(na+0.5*k)) / ((cb+0.5)/(nb+0.5*k))), 4) AS psi_term
      |FROM counts JOIN tot USING (dim)
      |ORDER BY dim, bucket""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("profile_drift_psi", driftPsi, Some(driftPsiSql)),
    QueryDef("profile_lineitem", profileLineitem, Some(profileLineitemSql)),
    QueryDef("profile_histogram", histogram, Some(histogramSql)),
    QueryDef("profile_correlations", correlations, Some(correlationsSql)),
    QueryDef("profile_heavy_hitters", heavyHitters, Some(heavyHittersSql))
  )
}
