package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, ScalarSubquery}
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

  /** Column ↔ catalyst Expression bridges (`classic.ExpressionUtils` is
    * sql-private).
    */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A 1-row/1-col DataFrame as a catalyst scalar-subquery expression —
    * the shape expressions like BloomFilterMightContain demand for their
    * "constant" inputs (it is how InjectRuntimeFilter feeds them: the
    * subquery executes once, its scalar lands in the consuming plan as a
    * literal).
    */
  def scalarSubquery(df: DataFrame): Expression =
    ScalarSubquery(df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed)
}
