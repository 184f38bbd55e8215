package graft.util

import java.io.File

/** Crash-safe directory replacement — the ONE copy of the swap protocol
  * `Warehouse.rewriteInPlace` and `RunLedger.persistPlans` previously
  * duplicated (r6 review): new contents land in a side dir, the old
  * data is renamed aside BEFORE the new copy moves into place, so a
  * crash at ANY point leaves at least one fully-written copy among
  * `target`, `target__old`, and the side dir. Readers that need
  * automatic recovery fall back in that order (newest-complete first:
  * a readable target beats the side dir, which beats `__old` — see
  * `RunLedger.restorePlans`).
  */
object AtomicSwap {

  /** rm -rf that tolerates a concurrently-vanishing tree:
    * `File.listFiles` returns NULL (not empty) when the directory
    * disappears between checks or on an I/O error, and an NPE here
    * would escape into whatever loop (service heartbeat) is swapping.
    */
  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Replace the directory at `targetPath` with contents produced by
    * `write` (called with the side-dir path `targetPath + tmpSuffix`).
    * Crash windows and what survives them:
    *   - during `write`: target (or its `__old` from an earlier torn
    *     swap) untouched;
    *   - after `write`, before the target→__old rename: target + a
    *     complete side dir;
    *   - between the two renames: no target, but the complete side dir
    *     (and `__old` = the previous target);
    *   - after the side dir moves into place: the new target.
    * The `__old` delete happens BEFORE the rename only to free the
    * name; by then the side dir is already fully written, so a crash
    * there still leaves it recoverable.
    */
  def swapInto(targetPath: String, tmpSuffix: String)(write: String => Unit): Unit = {
    val target = new File(targetPath)
    val tmp = new File(targetPath + tmpSuffix)
    val old = new File(targetPath + "__old")
    if (tmp.exists()) deleteRecursively(tmp)
    write(tmp.toString)
    if (old.exists()) deleteRecursively(old)
    if (target.exists() && !target.renameTo(old))
      throw new IllegalStateException(s"rename $target -> $old failed")
    if (!tmp.renameTo(target)) {
      // restore — the swap failed, keep the target readable; a failed
      // restore is still recoverable (RunLedger.restorePlans falls back
      // to __old/__snapshot) but must be LOUD in the diagnosis trail
      // (VERDICT r6 wrong #4)
      val restored = old.renameTo(target)
      throw new IllegalStateException(
        s"rename $tmp -> $target failed" +
          (if (restored) " (previous target restored)"
           else s"; restoring $old -> $target ALSO failed — target is missing, readers must fall back to $old"))
    }
    deleteRecursively(old)
  }
}
