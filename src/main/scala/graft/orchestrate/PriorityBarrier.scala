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
    * run concurrently, across groups strictly sequentially. Fails fast:
    * a failed group does not start later groups.
    */
  def run[A](items: Seq[(Int, A)])(exec: A => Future[Unit])(implicit ec: ExecutionContext): Future[Unit] = {
    val groups = items.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))
    groups.foldLeft(Future.unit) { (prev, group) =>
      prev.flatMap(_ => Future.sequence(group.map(exec)).map(_ => ()))
    }
  }
}
