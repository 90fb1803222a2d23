package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Dev-tool bridge to the private[spark] listener bus: profiling tools
  * (graft.tools.ProfQ21) need a deterministic drain between the warm and
  * measured runs — `Thread.sleep` was a heuristic that could leak warm-run
  * stage events into the measured profile or drop measured ones.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
