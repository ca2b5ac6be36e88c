package org.apache.spark

/** Minimal bridge into `private[spark]` SparkContext internals (the
  * `sql`-side twin is [[org.apache.spark.sql.GraftBridge]]).
  *
  * Listener-derived measurements (per-query bytes-read accounting in
  * `graft.util.ScanStats`) are only correct after the asynchronous
  * listener bus has delivered every queued event; the supported way to
  * wait for that is `listenerBus.waitUntilEmpty`, which Spark keeps
  * `private[spark]`.
  */
object GraftCoreBridge {

  /** Block until every queued listener event has been delivered, or
    * `timeoutMs` elapses. Returns false on timeout (callers treat the
    * snapshot as best-effort rather than failing the run). */
  def flushListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
