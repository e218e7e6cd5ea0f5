package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for the bench's per-key stage/task
  * accounting. `SparkContext.listenerBus` is `private[spark]`, so this
  * one-liner lives under the `org.apache.spark` package — public-API
  * compilation against the stock Spark jars, no reflection. Without the
  * drain, an async stage-completed event can land after a snapshot and
  * be attributed to the NEXT bench leg (the round-6 ADVICE note on the
  * Thread.sleep(200) best-effort bracket).
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
