package graft.engine


import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Per-build shuffle accounting: attributes every task's shuffle WRITE
  * bytes to the model being materialized, via the job group the build
  * loop sets around each node ([[Engine.build]]). Write bytes are the
  * right single number for "how much did this node exchange" — each
  * `Exchange` in the plan writes its payload exactly once (reads can
  * repeat), so the figure is Σ exchange payloads for the node's jobs.
  *
  * Grouping rides Spark's own thread-local job-group property
  * (`setJobGroup`), which is also what makes the accounting correct
  * under `build(threads > 1)`: each worker thread tags only its own
  * node's jobs. Events arrive on the async listener bus; the build loop
  * drains the bus (`SparkListenerAccess.drain`) before reading a
  * node's total, so the number in [[NodeResult.shuffleBytes]] is final,
  * not racy.
  *
  * Also consumed by [[graft.Bench]] (hence `private[graft]`): each
  * query's first timed run is tagged so bench.json carries per-query
  * shuffle-write bytes — the plan-shape regression signal wall time
  * can't give (an accidental extra Exchange shows up here even when
  * the clock noise hides it).
  */
private[graft] final class ShuffleBytesListener extends SparkListener {
  private val stageToGroup = new ConcurrentHashMap[Int, String]()
  private val bytes = new ConcurrentHashMap[String, AtomicLong]()

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val group = Option(js.properties)
      .flatMap(p => Option(p.getProperty(
        org.apache.spark.graftaccess.SparkListenerAccess.JobGroupKey)))
    group.foreach { g =>
      js.stageIds.foreach(id => stageToGroup.put(id, g))
    }
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val g = stageToGroup.get(te.stageId)
    if (g != null && te.taskMetrics != null) {
      val w = te.taskMetrics.shuffleWriteMetrics.bytesWritten
      if (w != 0L)
        bytes.computeIfAbsent(g, _ => new AtomicLong).addAndGet(w)
      ()
    }
  }

  /** Total shuffle bytes written under `group` so far. */
  def totalFor(group: String): Long =
    Option(bytes.get(group)).map(_.get()).getOrElse(0L)
}
