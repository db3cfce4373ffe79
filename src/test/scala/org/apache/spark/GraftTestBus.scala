package org.apache.spark

import org.apache.spark.scheduler.SparkListenerApplicationEnd

/** Test-only bridge into the `private[spark]` listener bus: lets a suite
  * fire the exact application-end event `SparkContext.stop()` posts,
  * without actually stopping the shared test context (one active context
  * per JVM — a real stop would break every later suite). Used by
  * TablesMemoSpec to exercise the Tables memo eviction path.
  */
object GraftTestBus {
  def postApplicationEnd(sc: SparkContext): Unit = {
    sc.listenerBus.post(SparkListenerApplicationEnd(0L))
    sc.listenerBus.waitUntilEmpty()
  }
}
