package graft.orchestrate

import scala.collection.concurrent.TrieMap
import scala.concurrent.{ExecutionContext, Future}

/** Package dependency DAG with shared execution — the reference runs all
  * `Vorlauf_ETL_Pakete_ID` predecessors before a package and, when a
  * predecessor is already running in another branch (or another
  * workflow), awaits that task instead of re-running it
  * (`/root/reference/code/DIZService.Core/Package.cs:844-1069`: the
  * global executing-packages task list is the memo; the busy-wait on the
  * initializing list is the race guard). A memoized `Future` map gives
  * the identical observable behavior — one execution per package id,
  * failure propagated to every waiter — without the polling.
  */
final class PackageDag(deps: Int => Seq[Int], run: Int => Unit)(implicit ec: ExecutionContext) {

  private val memo = TrieMap.empty[Int, Future[Unit]]

  /** Execute `pkg` after its transitive predecessors. Cycles are a config
    * error the reference would busy-hang on; we fail fast instead.
    */
  def execute(pkg: Int): Future[Unit] = {
    detectCycle(pkg)
    executeChecked(pkg)
  }

  private def executeChecked(pkg: Int): Future[Unit] =
    // Not getOrElseUpdate: its thunk runs outside the map lock in TrieMap,
    // so two racers could both build a future. putIfAbsent of a lazily
    // triggered promise keeps exactly one execution per package.
    memo.get(pkg) match {
      case Some(f) => f
      case None =>
        val p = scala.concurrent.Promise[Unit]()
        memo.putIfAbsent(pkg, p.future) match {
          case Some(existing) => existing
          case None =>
            p.completeWith {
              Future.sequence(deps(pkg).map(executeChecked))
                .flatMap(_ => Future(run(pkg)))
            }
            p.future
        }
    }

  private def detectCycle(root: Int): Unit = {
    def dfs(n: Int, path: List[Int], seen: Set[Int]): Unit = {
      if (path.contains(n))
        throw new EtlStateException(
          s"package dependency cycle: ${(n :: path.takeWhile(_ != n) ::: List(n)).reverse.mkString(" -> ")}")
      if (!seen.contains(n)) deps(n).foreach(dfs(_, n :: path, seen + n))
    }
    dfs(root, Nil, Set.empty)
  }

  /** Ids that have started (or finished) executing — the reference's
    * executing-packages list.
    */
  def started: Set[Int] = memo.keySet.toSet
}
