package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-local bridge: `Dataset.ofRows` is `private[sql]`, and building
  * a DataFrame from a hand-constructed `LogicalPlan` (the custom-operator
  * path: logical node → injected Strategy → custom SparkPlan) has no
  * public API. The one-liner every Spark extension library ships.
  */
object GraftSqlShim {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      session.asInstanceOf[classic.SparkSession], plan)
}
