package graft.engine

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Session-scoped scratch directories for the incremental query
  * entries' temp warehouses.
  *
  * Every `q_*_incremental`-style query materializes an engine DAG into
  * a throwaway warehouse per invocation. The raw
  * `Files.createTempDirectory` pattern leaked: Bench's warm pass plus
  * median-of-3 repeats left four orphaned parquet warehouses in /tmp
  * per such query per run (31 sites × 4 ≈ 120 dirs), and nothing ever
  * deleted them. This registry keeps at most ONE live dir per slot —
  * allocating a slot's next dir deletes its previous one — and a JVM
  * shutdown hook removes whatever is still live at exit, so a full
  * Bench/Verify pass ends with /tmp clean.
  *
  * CONTRACT (why deleting the previous dir is safe): callers consume
  * the DataFrame built over a scratch dir before invoking the same
  * query again — exactly how every driver works (Verify writes each
  * result, Bench/AnchorProbe/ScaleProbe consume each rep before the
  * next construction). A caller that held a stale unconsumed plan
  * across a re-invocation would lose the files under it; no driver or
  * spec does.
  *
  * Scratch must NOT be used for engine model targets themselves —
  * those live in caller-owned warehouses with [[DirSwap]] atomicity.
  */
object Scratch {
  private val live = new ConcurrentHashMap[String, Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      live.values.forEach { p =>
        try DirSwap.deleteRecursively(p.toString)
        catch { case _: Throwable => () }
      }
    }, "graft-scratch-cleanup"))
  }

  /** A fresh empty scratch dir for `slot` (one live dir per slot: the
    * slot's previous dir, if any, is deleted best-effort first).
    * Synchronized: create-then-put-then-delete is not atomic per slot,
    * and two concurrent callers of the SAME slot would otherwise delete
    * each other's live directory mid-build. Today every driver invokes
    * queries sequentially (the contract above), so the lock is
    * uncontended — it exists so the one-live-dir registry stays safe
    * the day a caller parallelizes query construction. Allocation is
    * rare (once per query invocation), never hot-path. */
  def dir(slot: String): String = synchronized {
    val fresh = Files.createTempDirectory(slot)
    val prev = live.put(slot, fresh)
    if (prev != null)
      try DirSwap.deleteRecursively(prev.toString)
      catch { case _: Throwable => () }
    fresh.toString
  }
}
