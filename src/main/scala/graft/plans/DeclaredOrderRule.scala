package graft.plans

import graft.sources.{DeltaFileIndex, GraftFileIndex, IcebergFileIndex}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Post-hoc resolution rule restoring a graft table's DECLARED column
  * order on `spark.read.format("graft")` relations.
  *
  * The V1 file-source contract fixes a relation's output to
  * `dataSchema ++ partitionSchema` — partition columns last — so a table
  * whose partition column is not declared last would read back in a
  * different column order than [[graft.sources.ManifestTable.read]] and
  * the streaming source (both of which emit declared order). This rule
  * wraps such relations in a `Project` of the declared order; pushdown
  * is unaffected (a projection over the scan), and relations already in
  * declared order pass through untouched.
  *
  * Runs in the analyzer's post-hoc batch (executed Once), via
  * `resolveOperatorsUp` so already-analyzed subtrees embedded in new
  * queries are not re-wrapped.
  */
object DeclaredOrderRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case rel: LogicalRelation => rel.relation match {
      case fsRel: HadoopFsRelation =>
        val declaredOpt = fsRel.location match {
          case idx: GraftFileIndex => Some(idx.declaredFieldOrder)
          case idx: DeltaFileIndex => Some(idx.declaredFieldOrder)
          case idx: IcebergFileIndex => Some(idx.declaredFieldOrder)
          case _ => None
        }
        declaredOpt match {
          case Some(declared) =>
            // attributes outside the declared set (the analyzer's
            // materialized `_metadata` column) ride along untouched —
            // reordering must never hide them from operators above
            val (regular, extras) = rel.output.partition(a => declared.contains(a.name))
            if (regular.map(_.name) == declared) rel
            else {
              val byName = regular.map(a => a.name -> a).toMap
              Project(declared.map(byName(_)) ++ extras, rel)
            }
          case _ => rel
        }
      case _ => rel
    }
  }
}
