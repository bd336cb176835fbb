package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Compile-time bridge to the `private[spark]` listener bus.
  *
  * [[graft.Bench]] attributes executor-CPU/GC deltas to individual queries;
  * listener delivery is asynchronous, so without a flush between queries a
  * slow bus would credit query N's tasks to query N+1. `waitUntilEmpty` is
  * exactly the synchronization point Spark's own test harness uses — it is
  * just package-private, hence this one-line bridge.
  */
object ListenerBridge {
  /** Block until all posted listener events have been delivered (bounded). */
  def flush(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () } // diagnostics only — never fail the bench
}
