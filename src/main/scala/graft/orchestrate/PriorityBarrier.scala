package graft.orchestrate

import scala.concurrent.{ExecutionContext, Future}

/** Priority barrier over realizations (`/root/reference/code/
  * DIZService.Core/Package.cs:1076-1120`, ordered read `503-514`): items
  * sharing a `Paket_Priorisierung` value run concurrently; a priority
  * change is a full barrier (`Task.WaitAll` per group before the next
  * group starts).
  */
object PriorityBarrier {

  /** Run `items` grouped by ascending priority; within a group all items
    * run concurrently, across groups strictly sequentially. A failed
    * group does not start later groups, but the group itself is a TRUE
    * barrier ([[Futures.waitAll]], the reference's `Task.WaitAll`): its
    * future resolves only after every member resolved, so a fast-failing
    * sibling cannot let the caller proceed — or start compensation —
    * while a slow member of the same group is still executing.
    */
  def run[A](items: Seq[(Int, A)])(exec: A => Future[Unit])(implicit ec: ExecutionContext): Future[Unit] = {
    val groups = items.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))
    groups.foldLeft(Future.unit) { (prev, group) =>
      prev.flatMap(_ => Futures.waitAll(group.map(exec)).map(_ => ()))
    }
  }
}
