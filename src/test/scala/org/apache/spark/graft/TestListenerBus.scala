package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only accessor for the `private[spark]` listener bus: lets specs
  * deterministically drain async listener events instead of polling for
  * a wall-clock quiet period (which flakes on loaded machines). */
object TestListenerBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
