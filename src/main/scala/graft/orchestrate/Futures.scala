package graft.orchestrate

import scala.concurrent.{ExecutionContext, Future}
import scala.util.{Failure, Success}

/** `Task.WaitAll` semantics for a Future group — resolve only after
  * EVERY member has resolved, then surface the first failure in the
  * group's original order. `Future.sequence` fails FAST instead
  * (its flatMap chain short-circuits on the first failure), which broke
  * the reference's barrier contract (r10 review): a package's Await
  * returned while a sibling realization's step was still writing data,
  * so the fallback package — and even the workflow's next scheduled
  * run — could overlap in-flight work of the failed group. The
  * reference awaits the whole group even when one task faults
  * (`Package.cs:1076-1120` Task.WaitAll; `Realization.cs:573-885`).
  */
object Futures {

  def waitAll[A](fs: Seq[Future[A]])(implicit ec: ExecutionContext): Future[Seq[A]] =
    Future.traverse(fs)(_.transform(t => Success(t))).map { tries =>
      tries.collectFirst { case Failure(e) => e }.foreach(e => throw e)
      tries.collect { case Success(a) => a }
    }
}
