package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's sql-private Column ⇄ Catalyst-Expression
  * conversion (org.apache.spark.sql.classic.ExpressionUtils is
  * private[sql]). The standard pattern for extension libraries that define
  * custom Catalyst expressions and expose them as public `Column`
  * functions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode → Catalyst conversion. `expression` wraps the
    * Column's node in a lazy ColumnNodeExpression adapter, which classic
    * Dataset analysis converts — but an adapter returned from a
    * FunctionRegistry builder into a pure-SQL plan is never revisited and
    * reaches codegen unconverted (INTERNAL_ERROR). Converting eagerly
    * yields plain UnresolvedFunction/Literal trees the SQL analyzer
    * resolves like any parsed expression. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  def analyzedPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
