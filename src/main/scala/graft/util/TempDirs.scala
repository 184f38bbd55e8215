package graft.util

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** A registry of scratch directories swept in one shot. Instantiable so
  * tests can exercise the lifecycle without touching the global
  * [[TempDirs]] registry mid-run (suites share one session, and e2e
  * gates memoize warehouses that live in global scratch dirs).
  */
class DirRegistry {
  private val dirs = new ConcurrentLinkedQueue[Path]

  /** Create and register a temp directory; returns its absolute path. */
  def scratch(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Recursively delete every registered scratch dir. Callers must have
    * consumed (collected/written) any DataFrame that still reads from
    * one — after the sweep those plans fail on re-execution.
    */
  def sweep(): Unit = {
    var p = dirs.poll()
    while (p != null) {
      delete(p.toFile)
      p = dirs.poll()
    }
  }

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete()
  }
}

/** Scratch directories for gates that round-trip through a real file
  * sink (streaming checkpoints + parquet sinks, warehouse dirs, XLSX
  * ingest trees). A gate's result DataFrame reads BACK from its scratch
  * dir lazily, so the gate cannot delete the dir itself — the caller
  * consumes the result first. Every scratch dir is therefore registered
  * here and swept either explicitly (Verify/Bench sweep after consuming
  * all results) or by the JVM shutdown hook — so repeated Verify/Bench
  * invocations no longer accrete checkpoint/sink parquet in /tmp
  * (VERDICT r7 item 5).
  */
object TempDirs extends DirRegistry {
  Runtime.getRuntime.addShutdownHook(new Thread(() => sweep()))
}
