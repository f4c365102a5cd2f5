package org.apache.spark

/** Test shim: the listener bus and its waitUntilEmpty are
  * private[spark]; draining the bus is the only race-free way to assert
  * "no job of kind X ran" after an action (first-event polling races
  * late deliveries). Same bridge technique as GraftBridge. */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
