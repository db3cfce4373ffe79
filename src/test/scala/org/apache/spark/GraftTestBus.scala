package org.apache.spark

import org.apache.spark.scheduler.SparkListenerApplicationEnd

/** Test-only bridge into the `private[spark]` listener bus: lets a suite
  * fire the exact application-end event `SparkContext.stop()` posts,
  * without actually stopping the shared test context (one active context
  * per JVM — a real stop would break every later suite). Used by
  * TablesMemoSpec to exercise the Tables memo eviction path.
  *
  * Fan-out caveat: the event reaches EVERY listener on the shared bus
  * (Spark's AppStatusListener marks the app ended in the status store,
  * and all Tables memo entries clear and re-populate on next load).
  * Both are benign for these suites — nothing here reads the status
  * store and the memo is a cache — but a listener with real app-end
  * side effects must not be registered on the shared test context.
  */
object GraftTestBus {
  def postApplicationEnd(sc: SparkContext): Unit = {
    sc.listenerBus.post(SparkListenerApplicationEnd(0L))
    sc.listenerBus.waitUntilEmpty()
  }
}
