package org.apache.spark

/**
 * Minimal bridge to the `private[spark]` listener-bus accessor, so bench
 * telemetry can drain in-flight task-end events before snapshotting
 * per-query shuffle/spill byte counters (`waitUntilEmpty` itself is public;
 * only the `sc.listenerBus` getter is package-private). The standard
 * Spark-extension-library idiom; no Spark internals are modified.
 */
object GraftListenerBridge {
  /** Block until queued listener events are delivered (or timeout). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
