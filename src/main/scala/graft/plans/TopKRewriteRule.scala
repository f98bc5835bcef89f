package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: the familiar `row_number() OVER (PARTITION BY …
  * ORDER BY …) ≤ k` filter — when the rank column is then DISCARDED —
  * is exactly a per-key top-k, so plan it as [[TopKPerKey]] (bounded
  * heaps, no per-key sort; measured 5–7× the window plan in SCALE.md)
  * instead of a full Window. Users keep writing the standard SQL-shaped
  * formulation and the optimizer picks the physical operator.
  *
  * Fires only on the exact-safe shape:
  *   - a single `row_number` window expression (rank/dense_rank admit
  *     ties — different semantics — and multi-expression windows need
  *     the window operator anyway),
  *   - a filter of precisely `rnk <= k`, `rnk < k`, or `rnk = 1` on the
  *     rank attribute (compound predicates are left alone),
  *   - a projection above that drops the rank column (if the query
  *     returns the rank, the window must compute it),
  *   - a non-empty partition spec (global top-k already plans as
  *     `TakeOrderedAndProject`).
  * A `WindowGroupLimit` the built-in `InferWindowGroupLimit` may have
  * inserted below the window is subsumed by the heap operator and
  * stripped.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** Opt-out: the heap operator keeps per-key state on plain JVM heap
    * (see TopKPerKey's memory envelope); a job with billions of tiny
    * groups that relies on the window sort's spill path disables the
    * rewrite here instead of resorting to keeping a dummy rank column. */
  val EnabledKey = "spark.graft.topkRewrite.enabled"

  private def limitOf(cond: Expression, rnk: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnk) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnk)        => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rnk)         => Some(1)
    case _                                                                         => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, wChild, _))) if partitionSpec.nonEmpty =>
      val rnk = alias.toAttribute
      limitOf(cond, rnk) match {
        case Some(k) if k > 0 && !projectList.exists(_.exists(_.semanticEquals(rnk))) =>
          val child = wChild match {
            case WindowGroupLimit(_, _, _, _, c) => c // subsumed by the heap
            case c                               => c
          }
          Project(projectList, TopKPerKey(partitionSpec, orderSpec, k, child))
        case _ => p
      }
  }
}
