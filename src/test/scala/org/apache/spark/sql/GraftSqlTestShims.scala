package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only access to `classic.Dataset.ofRows` (private[sql]): the
  * GuardrailsSpec limit lint materializes a Sort node's CHILD as a
  * DataFrame to check the sort keys form a total order empirically.
  */
object GraftSqlTestShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
