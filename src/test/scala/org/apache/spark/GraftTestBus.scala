package org.apache.spark

/** Test-only bridge into the `private[spark]` listener bus: the
  * ExecutionListenerBus delivers QueryExecutionListener events
  * asynchronously on the shared LiveListenerBus, so a test that reads
  * listener-accumulated state right after an action races the bus.
  * [[flush]] blocks until every queued event has been delivered. */
object GraftTestBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000)
}
