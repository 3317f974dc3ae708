package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Runtime registration of SQL functions on a live session (the
 * `spark.sql.extensions` path only applies at session build time).
 * Uses the private[sql] sessionState, hence this package.
 */
object FunctionRegistryBridge {
  def register(spark: SparkSession, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.VectorExpressions", null, name, usage, ""),
      builder)
  }
}
