package org.apache.spark.graftaccess

import org.apache.spark.SparkContext

/** The one `private[spark]` reach-in the engine needs: block until the
  * listener bus has delivered all queued events, so per-node shuffle
  * totals read after a materialization are final rather than racing the
  * async bus. Spark's own test utilities use exactly this call; there is
  * no public equivalent.
  */
object SparkListenerAccess {
  /** The job-properties key `setJobGroup` writes (`private[spark]` on
    * SparkContext; its value is a stable wire-level constant). */
  val JobGroupKey: String = SparkContext.SPARK_JOB_GROUP_ID

  /** Best-effort: on a bus saturated by unrelated producers (e.g. a
    * concurrent streaming query) the 10 s internal timeout surfaces as
    * a TimeoutException — accounting must never fail a build, so that
    * case degrades to slightly-stale totals instead. */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
