package graft.util

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Exercises a private DirRegistry instance, NOT the global TempDirs —
  * sweeping the global registry mid-run would delete scratch dirs the
  * shared-session e2e gates still read through their memoized caches.
  */
class TempDirsSpec extends AnyFunSuite {

  test("scratch registers a dir that sweep removes recursively (VERDICT r7 item 5)") {
    val reg = new DirRegistry
    val d = reg.scratch("tempdirs-spec")
    val nested = Paths.get(d, "ckpt", "offsets")
    Files.createDirectories(nested)
    Files.writeString(nested.resolve("0"), "v1")
    assert(Files.exists(nested.resolve("0")))
    reg.sweep()
    assert(!Files.exists(Paths.get(d)), s"sweep must remove $d")
  }

  test("sweep is idempotent and tolerates an already-deleted dir") {
    val reg = new DirRegistry
    val d = reg.scratch("tempdirs-gone")
    Files.delete(Paths.get(d))
    reg.sweep() // must not throw
    reg.sweep()
    // a second scratch after a sweep registers fresh
    val d2 = reg.scratch("tempdirs-again")
    assert(Files.exists(Paths.get(d2)))
    reg.sweep()
    assert(!Files.exists(Paths.get(d2)))
  }
}
