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
final class PackageDag(deps: Long => Seq[Long], run: Long => Unit)(implicit ec: ExecutionContext) {

  private val memo = TrieMap.empty[Long, Future[Unit]]

  /** Execute `pkg` after its transitive predecessors. Cycles are a config
    * error the reference would busy-hang on; we fail fast instead. Ids
    * are the config plane's native Long (r10 review: an Int-keyed memo
    * silently aliased ids 2^32 apart — the aliased package never ran).
    */
  def execute(pkg: Long): Future[Unit] = {
    detectCycle(pkg)
    executeChecked(pkg)
  }

  private def executeChecked(pkg: Long): Future[Unit] =
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

  private def detectCycle(root: Long): Unit = {
    // `visited` is GLOBAL across branches (classic white/gray/black DFS):
    // a node fully explored via one diamond arm is skipped when the other
    // arm reaches it. The earlier form threaded the seen-set down the
    // recursion only — it always equalled the path set, so a chain of n
    // diamonds re-explored the tail 2^n times and the fail-fast check
    // itself hung on exactly the shared-predecessor configs this DAG
    // exists for (r10 review). Cycle membership still uses the on-path
    // set: in a DFS every gray node IS on the current path.
    val visited = scala.collection.mutable.Set.empty[Long]
    def dfs(n: Long, path: List[Long], onPath: Set[Long]): Unit = {
      if (onPath.contains(n))
        throw new EtlStateException(
          s"package dependency cycle: ${(n :: path.takeWhile(_ != n) ::: List(n)).reverse.mkString(" -> ")}")
      if (visited.add(n)) deps(n).foreach(dfs(_, n :: path, onPath + n))
    }
    dfs(root, Nil, Set.empty)
  }

  /** Ids that have started (or finished) executing — the reference's
    * executing-packages list.
    */
  def started: Set[Long] = memo.keySet.toSet
}
