package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Private-API bridge (the ColumnBridge pattern): listener-bus events
  * are delivered asynchronously, so per-query metric snapshots must
  * drain the bus before reading — otherwise a query's last task-end
  * events can be attributed to the NEXT query. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
