package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Minimal bridge to the `private[sql]` seams that Spark does not
  * expose publicly but a file-source extension needs (the standard
  * pattern used by external Spark connectors): wrapping an
  * `RDD[InternalRow]` produced by a custom file scan into a DataFrame,
  * and Column↔Expression conversion for composing built-in Catalyst
  * expressions (e.g. BloomFilterMightContain) that have no public
  * `functions._` wrapper. Nothing else in the codebase touches Spark
  * internals directly.
  */
object GraftSqlShim {

  def internalCreateDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  def ofRows(
      spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** A clone of the session sharing its SparkContext with a COPY of its
    * SQL conf/state — a scoped conf override can be applied to the clone
    * without mutating (or racing) the shared session
    * (`cloneSession` is `private[sql]`). */
  def cloneSession(spark: SparkSession): classic.SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Catalyst predicate → data-source `Filter`, when translatable
    * (`DataSourceStrategy.translateFilter` is `protected[sql]`). */
  def translateFilter(
      e: catalyst.expressions.Expression): Option[sources.Filter] =
    execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)
}
