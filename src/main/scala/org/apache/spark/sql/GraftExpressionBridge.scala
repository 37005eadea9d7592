package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to the `private[sql]` Column ⇄ Expression converters, so
 * graft's native Catalyst expressions (SimHash64, PortableHash60Expr,
 * HyperplaneBucket) can be wrapped as `Column`s directly — including inside
 * higher-order-function lambdas, where session-registered functions are not
 * addressable by name. The standard Spark-extension-library idiom; no Spark
 * internals are modified.
 */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
