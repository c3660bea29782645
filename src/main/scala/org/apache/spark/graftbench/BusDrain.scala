package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Compile-time-checked bridge to one `private[spark]` member the bench
  * harness needs: `SparkContext.listenerBus.waitUntilEmpty()`. Task-end
  * events are delivered on the async listener bus, so a per-query metrics
  * window (graft.WorkMass) must drain the bus before snapshotting or a
  * slow delivery attributes one query's shuffle bytes to the next. Spark
  * exposes the drain only `private[spark]` (it is the hook its own tests
  * use); declaring this object inside the org.apache.spark namespace is
  * the standard, binary-compatible way to reach it without reflection.
  * Bench/ScaleBench-only — never on a query execution path. */
object BusDrain {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
