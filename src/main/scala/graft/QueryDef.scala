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
    oracle: Option[String],
    /** Corpus-scale stage frames for EAGER keys (r18 — the r17
      * verdict's #1): a key whose `build` executes imperatively
      * (scratch checkpoints, stream drains) returns a small localized
      * frame, which is all a plan snapshot of the RESULT can see
      * (0/0/0/0) — its corpus-scale stages could regress unguarded.
      * When set, the callback receives each named stage's
      * pre-localize DataFrame; PlanSnapshot records them as
      * `name#stage` rows and PlanGuardSpec budgets them like any
      * query. Builders may materialize small scratch inputs to make
      * the downstream plan real (the funnel's checkpointed verdicts,
      * the incremental-dedup bootstrap index) and own their cleanup —
      * the frames are only valid inside the callback. */
    stages: Option[(Tables, (String, DataFrame) => Unit) => Unit] = None
)
