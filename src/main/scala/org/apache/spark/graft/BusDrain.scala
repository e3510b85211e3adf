package org.apache.spark.graft

import org.apache.spark.SparkContext

/**
 * `SparkContext.listenerBus` is `private[spark]`; this one-line shim lives in
 * the `org.apache.spark` package solely so diagnostic mains (ShuffleProbe)
 * can drain the async listener bus deterministically instead of sleeping.
 */
object BusDrain {
  /** Block until all posted listener events have been delivered (or timeout). */
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
