package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental gold refresh driven by manifest CDF reads — keep a derived
  * aggregate table in step with its source by folding in ONLY the rows
  * added since the last refresh. The reference keeps its gold tables fresh
  * by rewriting them from the full silver read
  * (`load_data_task.py:177-191`); at 100 TB the rewrite is the bottleneck
  * and this is the replacement: each refresh reads `changesBetween(lastV,
  * curV)` (file-level manifest diff — no scan of already-reflected data),
  * merges the partial aggregate into the previous gold state, and commits.
  *
  * Exactly-once: the gold table REMEMBERS which source version it reflects
  * via the txn high-water mark, in the SAME commit as the data
  * ([[ManifestTable.exactlyOnceOverwrite]] with `batchId = source
  * version`), so a crash between compute and bookkeeping is impossible and
  * replaying a refresh is a no-op. Compaction of the source advances its
  * version without data change; the refresh then merges an empty delta and
  * just advances the mark.
  */
object IncrementalRefresh {

  /** Gold column names: the grouped keys plus `n` (row count) and `total`
    * (sum of `valueCol`). count/sum are the self-merging aggregates —
    * `merge(gold, partial) = groupBy(keys).sum` — which is what makes the
    * refresh a pure fold. (avg/min/max variants decompose the same way;
    * distinct counts need a sketch column — see Profiler's HLL/CMS.)
    *
    * `allowRemoves = true` extends the fold to DELETE/MERGE commits in the
    * source range: the CDF read tags each row insert/delete and the fold
    * adds or SUBTRACTS it (count and sum are abelian-group aggregates —
    * they have inverses; min/max do not and would need a rebuild). Groups
    * whose count reaches zero are dropped, so the refreshed gold equals a
    * from-scratch recompute. Exact for integral/decimal totals; float
    * totals can drift by re-association ulps, same as any float re-agg. */
  def refreshAggregate(spark: SparkSession, sourceRoot: String, goldRoot: String,
      keyCols: Seq[String], valueCol: String, allowRemoves: Boolean = false): Option[Long] = {
    require(keyCols.nonEmpty, "refreshAggregate needs at least one key column")
    // normalize: '/silver' and '/silver/' are the same table to
    // ManifestTable, so they must share one high-water mark — distinct
    // appIds would silently re-fold the whole source onto existing gold
    val appId = s"incr-refresh:${sourceRoot.stripSuffix("/")}"
    val curV = ManifestTable.currentVersion(spark, sourceRoot).getOrElse(
      return None) // nothing committed upstream yet — nothing to reflect
    val lastMark = ManifestTable.txnHighWaterMark(spark, goldRoot, appId)
    val lastV = lastMark.getOrElse(0L)
    if (curV <= lastV) return None // already reflects this source version
    // without allowRemoves this fails loud if the range contains an
    // overwrite/replaceWhere/delete/merge — removed rows cannot be folded
    // add-only; [[rebuild]] is the recovery
    val delta = ManifestTable.changesBetween(spark, sourceRoot, lastV, curV,
      includeRemoves = allowRemoves)
    // pin `total` to a self-stable sum type: summing decimal(p,s) yields
    // decimal(p+10,s), so an unpinned merge would widen the committed gold
    // schema every refresh and wedge on the drift check — decimal(38,s) is
    // sum's fixed point; integral/float sums are already stable
    val stableTotal = (c: org.apache.spark.sql.Column) =>
      delta.schema(valueCol).dataType match {
        case d: org.apache.spark.sql.types.DecimalType =>
          c.cast(org.apache.spark.sql.types.DecimalType(38, d.scale))
        case _ => c
      }
    // signed fold: inserts count +1 / +value, deletes −1 / −value; the
    // add-only path is the same fold with sign ≡ +1
    val sign =
      if (allowRemoves) when(col("_change_type") === "insert", 1L).otherwise(-1L)
      else lit(1L)
    val partial = delta
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("n"),
        // a null value contributes to neither side: sign*null is null and
        // sum skips it — its insert and its delete cancel by omission
        stableTotal(sum(sign * col(valueCol))).as("total"))
    val folded =
      if (lastV == 0L) partial
      else ManifestTable.read(spark, goldRoot).unionByName(partial)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col("n")).as("n"), stableTotal(sum(col("total"))).as("total"))
    // a group whose every row was deleted must VANISH from gold (recompute
    // equivalence), not linger as a zero row
    val merged = if (allowRemoves) folded.filter(col("n") =!= 0L) else folded
    // priorMark: the fold above merged gold-as-of-lastMark; if a concurrent
    // refresher with the same appId commits in between, folding our delta
    // onto ITS gold would double-count the overlapping source range — the
    // commit verifies the mark is still lastMark and throws otherwise
    // (caller re-runs refreshAggregate; replays still return None above)
    ManifestTable.exactlyOnceOverwrite(spark, goldRoot, merged, appId,
      batchId = curV, priorMark = Some(lastMark))
  }

  /** Recovery path: recompute gold from a FULL read of the source's
    * current snapshot and re-seed the high-water mark at its version —
    * for when the incremental fold can no longer serve the range (the
    * source took an overwrite/replaceWhere, or its early manifests were
    * vacuumed) and [[refreshAggregate]] fails loud. Same commit shape, so
    * the rebuild is itself exactly-once and the next [[refreshAggregate]]
    * resumes incrementally from the rebuilt version. Returns None if gold
    * already reflects the current source version. */
  def rebuild(spark: SparkSession, sourceRoot: String, goldRoot: String,
      keyCols: Seq[String], valueCol: String): Option[Long] = {
    require(keyCols.nonEmpty, "rebuild needs at least one key column")
    val appId = s"incr-refresh:${sourceRoot.stripSuffix("/")}"
    val curV = ManifestTable.currentVersion(spark, sourceRoot).getOrElse(return None)
    val full = ManifestTable.read(spark, sourceRoot)
    val stableTotal = (c: org.apache.spark.sql.Column) =>
      full.schema(valueCol).dataType match {
        case d: org.apache.spark.sql.types.DecimalType =>
          c.cast(org.apache.spark.sql.types.DecimalType(38, d.scale))
        case _ => c
      }
    val gold = full.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), stableTotal(sum(col(valueCol))).as("total"))
    ManifestTable.exactlyOnceOverwrite(spark, goldRoot, gold, appId, batchId = curV)
  }
}
