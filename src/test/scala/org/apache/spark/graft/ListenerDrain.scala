package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only escape hatch: `SparkContext.listenerBus` is `private[spark]`,
  * and job-count assertions need the async listener bus drained before
  * reading their counters.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
