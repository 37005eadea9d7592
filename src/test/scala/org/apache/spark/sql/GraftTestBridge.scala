package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/**
 * Test-only bridge to the `private[sql]` extension plumbing: applies an
 * extensions installer to an EXISTING session's function registry. Needed
 * because `getOrCreate` reuses the suite's shared session and only applies
 * `spark.sql.extensions` at SparkContext-first-session creation — a fresh
 * conf-bootstrapped session per suite is impossible in one JVM.
 */
object GraftTestBridge {
  def applyExtensions(installer: SparkSessionExtensions => Unit,
                      registry: FunctionRegistry): Unit = {
    val ext = new SparkSessionExtensions
    installer(ext)
    ext.registerFunctions(registry)
  }

  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.sessionState.functionRegistry
}
