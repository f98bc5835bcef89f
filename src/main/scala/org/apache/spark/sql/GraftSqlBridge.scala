package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor — the
  * standard technique for extension libraries that introduce their own
  * logical operators (a custom [[LogicalPlan]] node has no public
  * DataFrame constructor). Kept to the one call graft needs.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
