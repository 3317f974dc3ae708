package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge to Spark's private[sql] Column <-> Expression
 * converters, so graft can define native Catalyst expressions and use
 * them through the public Column API. Lives inside org.apache.spark.sql
 * for access (the reference library similarly lives inside
 * org.apache.spark.ml — spark-gp `GaussianProcessRegression.scala:1`).
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
