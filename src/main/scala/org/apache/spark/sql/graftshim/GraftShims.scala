package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridges to `private[sql]` Spark internals the graft SQL surface needs:
  * Column↔Expression conversion and building a DataFrame from a logical
  * plan. Lives in a subpackage of org.apache.spark.sql for access — the
  * standard pattern for Spark connectors extending the SQL layer. */
object GraftShims {

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
