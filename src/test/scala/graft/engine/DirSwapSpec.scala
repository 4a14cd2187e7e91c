package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Crash-state coverage for the shared rename-aside swap: every
  * intermediate state a crash can leave must keep one recoverable
  * generation, and [[DirSwap.recover]] must heal the one state where
  * the aside copy IS that generation (torn between rename-aside and
  * rename-into-place) before any later writer can orphan it. */
class DirSwapSpec extends AnyFunSuite {

  private def mk(path: String, marker: String): java.io.File = {
    val d = new java.io.File(path)
    d.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, marker), marker)
    d
  }
  private def has(path: String, marker: String): Boolean =
    new java.io.File(path, marker).exists

  test("recover: torn swap (target missing, .old present) restores .old as target") {
    val root = java.nio.file.Files.createTempDirectory("dirswap").toString
    val target = s"$root/t"
    mk(s"$target.old", "gen1") // crash landed between the two renames
    assert(DirSwap.recover(target))
    assert(has(target, "gen1") && !new java.io.File(s"$target.old").exists)
    // healthy states are no-ops
    assert(!DirSwap.recover(target))
    assert(!DirSwap.recover(s"$root/absent"))
  }

  test("replace on a torn swap recovers .old before swapping (no window with zero generations)") {
    val root = java.nio.file.Files.createTempDirectory("dirswap").toString
    val target = s"$root/t"
    // torn state: .old holds the ONLY generation. replace must restore
    // it as the live target first (recover), THEN swap it aside — the
    // old `.old` cleanup would have deleted the only copy up front.
    mk(s"$target.old", "gen1")
    mk(s"$root/staging", "gen2")
    DirSwap.replace(s"$root/staging", target)
    assert(has(target, "gen2"))
    assert(!new java.io.File(s"$target.old").exists)
    // writers that RECREATE a missing swap-managed dir must call
    // recover() first (the streaming foreachBatch contract) — that is
    // what keeps a torn .old from being orphaned under a partial
    // recreation and destroyed by the next replace's cleanup.
  }

  test("concurrent reader recover never wedges a racing replace") {
    // the streaming topology: a search stream's per-batch recover()
    // racing a maintenance compaction's replace(). Unserialized, the
    // reader can land inside the swap window (target missing, .old
    // present), "heal" the in-progress swap by restoring .old, and
    // fail the writer's commit rename — wedging the index stream in
    // fail/retry. The shared per-target monitor (plus replace's
    // cross-process commit retry) must keep every replace committing.
    val root = java.nio.file.Files.createTempDirectory("dirswap").toString
    val target = s"$root/t"
    mk(target, "gen0")
    val N = 300
    @volatile var stop = false
    @volatile var readerErr: Option[Throwable] = None
    val reader = new Thread(() => try {
      while (!stop) DirSwap.recover(target)
    } catch { case t: Throwable => readerErr = Some(t) })
    reader.start()
    try {
      (1 to N).foreach { i =>
        mk(s"$root/staging$i", s"gen$i")
        DirSwap.replace(s"$root/staging$i", target) // must never throw
      }
    } finally { stop = true; reader.join() }
    assert(readerErr.isEmpty, readerErr.toString)
    assert(has(target, s"gen$N"))
    assert(!new java.io.File(s"$target.old").exists)
  }

  test("replace: normal swap commits staging and clears the aside copy") {
    val root = java.nio.file.Files.createTempDirectory("dirswap").toString
    val target = s"$root/t"
    mk(target, "gen1")
    mk(s"$root/staging", "gen2")
    DirSwap.replace(s"$root/staging", target)
    assert(has(target, "gen2") && !has(target, "gen1"))
    assert(!new java.io.File(s"$target.old").exists)
    assert(!new java.io.File(s"$root/staging").exists)
  }
}
