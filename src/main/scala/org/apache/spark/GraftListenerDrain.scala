package org.apache.spark

/** Dev-tool shim: [[SparkContext.listenerBus]] is private[spark], but
  * [[graft.Profile]] must drain it before reading its task-metric
  * counters (a fixed sleep undercounts queries with slow metric
  * delivery — ADVICE r15). Used only by the profiling tool, never by a
  * query path. */
object GraftListenerDrain {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
