package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** One verifiable operator: a Spark implementation plus (when the semantics
  * are SQL-expressible) a DuckDB oracle over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare deterministic:
  *   - every output column is explicitly aliased, identically on both sides;
  *   - floating-point outputs are `round(x, 4)` on both sides;
  *   - results carry a total ORDER BY (id tie-breaks after any score).
  */
final case class QueryDef(
    name: String,
    build: Tables => DataFrame,
    oracle: Option[String]
)
