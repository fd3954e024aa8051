package org.apache.spark

/** Bridge into the listener bus's package-private drain — ScaleBench
  * reads per-pipeline task metrics (shuffle/input/spill bytes) through
  * a SparkListener, and listener events post asynchronously: without a
  * drain between two timed pipelines, one pipeline's tail events would
  * be attributed to the next. `waitUntilEmpty` is exactly the barrier
  * Spark's own test harnesses use; it is `private[spark]`, hence this
  * one-object shim in the org.apache.spark package. */
object GraftListenerBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
