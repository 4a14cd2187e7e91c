package graft.engine

/** Local-fs directory write-swap shared by [[Engine]]'s snapshot /
  * compaction rewrites and the streaming index maintenance
  * ([[graft.streaming.Streaming.compactVectorIndex]]); on HDFS/object
  * stores the analogue is `FileSystem.rename` / a transactional table
  * format's metadata swap.
  *
  * Swap order is crash-safe at every point: the old target is renamed
  * ASIDE (`target.old`) before the staging dir renames into place, and
  * only then deleted — so a crash inside the swap window leaves a
  * recoverable copy (`target.old` plus the committed staging dir),
  * never a state where NO generation of the data exists on disk. The
  * previous delete-then-rename order had exactly that window, which is
  * tolerable for an engine model (rebuildable from sources) but not for
  * a streaming target whose source batches may be retired. A leftover
  * `target.old` from a torn earlier swap is cleared first (the rename
  * into `target` is the commit point, so a surviving `.old` is always
  * the obsolete generation).
  */
object DirSwap {

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(deleteRec)
    f.delete(); ()
  }

  /** Replace `target` with the committed contents of `tmp`. */
  def replace(tmp: String, target: String): Unit = {
    val dir = new java.io.File(target)
    val old = new java.io.File(target + ".old")
    if (old.exists) deleteRec(old)
    if (dir.exists)
      require(dir.renameTo(old), s"swap failed moving $target aside")
    require(new java.io.File(tmp).renameTo(dir), s"swap failed for $target")
    if (old.exists) deleteRec(old)
  }
}
