package graft.orchestrate

import java.util.concurrent.Semaphore
import java.util.concurrent.locks.ReentrantReadWriteLock

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** The reference's concurrency gates (SURVEY §2.3), re-expressed as fair
  * JVM primitives instead of 100 ms busy-wait polling — observable
  * semantics preserved: bounded step parallelism, exclusive table access,
  * FIFO fairness, per-level exclusive runs.
  */
object Gates {

  /** Global step-thread cap — `MaxThreads` / `Anzahl_ETL_Threads`
    * (`Processor.cs:66,293-403`, gate in `Step.cs:448,517`). Fair so
    * queued steps start in arrival order like the reference's FIFO
    * queues.
    */
  class ThreadCap(maxThreads: Int) {
    private val sem = new Semaphore(maxThreads, true)
    // scala.concurrent.blocking: the gates park threads that usually
    // belong to an ExecutionContext pool; an unmanaged Semaphore.acquire
    // gives the pool no chance to spawn compensation threads (unlike
    // Await, which goes through BlockContext), so realizations whose
    // submission loops hold every pool worker in acquire() would
    // deadlock against the queued step futures that release the permits
    // (r10 review). blocking() is a no-op on non-pool threads.
    def acquire(): Unit = scala.concurrent.blocking(sem.acquire())
    def release(): Unit = sem.release()
    def withSlot[A](f: => A): A = { acquire(); try f finally release() }
    def available: Int = sem.availablePermits()
  }

  /** Table-access mutex — a step claims its source+target tables before
    * running; any step touching a claimed table waits
    * (`Processor.cs:978-1105`, `Workflow.cs:180-269`, gates
    * `Step.cs:449-469,519-538`). Claims are all-or-nothing (the whole
    * set at once), which also removes the deadlock the reference's
    * one-by-one claiming could hit. FIFO-fair like the reference's
    * per-table queues (`QueueManager.cs:583-712`): a claim may not
    * overtake an EARLIER waiting claim it conflicts with, so a step
    * wanting a popular table cannot starve behind a stream of
    * late-arriving claimants. Disjoint claims still pass freely.
    */
  final class TableLocks {
    private val claimed = mutable.Set.empty[String]
    // waiting claims in arrival order: (ticket, tables)
    private val waiting = mutable.ArrayBuffer.empty[(Long, Set[String])]
    private var nextTicket = 0L
    // who holds what — enforces the release-before-reclaim contract
    private val holdings = mutable.Map.empty[Thread, Set[String]]

    /** Claims are all-or-nothing and NON-REENTRANT: a thread holding any
      * tables must release before claiming again. A second claim while
      * holding throws instead of deadlocking — under FIFO fairness the
      * claimer would queue behind an earlier waiter that may be blocked
      * on the very tables this thread holds (ADVICE r3). The reference
      * has the same one-claim-per-step shape: a step claims its full
      * source+target set once up front (`Step.cs:449-469`).
      */
    def claim(tables: Set[String]): Unit = scala.concurrent.blocking(synchronized {
      val me = Thread.currentThread()
      val held = holdings.getOrElse(me, Set.empty)
      if (held.nonEmpty)
        throw new IllegalStateException(
          s"thread ${me.getName} already holds ${held.mkString(",")}; " +
            "release before claiming again (claims are all-or-nothing)")
      val ticket = nextTicket; nextTicket += 1
      waiting += ((ticket, tables))
      try {
        def blocked: Boolean =
          tables.exists(claimed.contains) ||
            waiting.exists { case (t, ts) => t < ticket && ts.exists(tables.contains) }
        while (blocked) wait()
        claimed ++= tables
        holdings(me) = tables
      } finally {
        // also on InterruptedException: an abandoned ticket left in the
        // queue would permanently block every later conflicting claim
        waiting.filterInPlace(_._1 != ticket)
        // our dequeue may unblock a LATER claim that was only queued
        // behind this entry
        notifyAll()
      }
    })

    def release(tables: Set[String]): Unit = synchronized {
      claimed --= tables
      holdings.keys.toSeq.foreach(t => holdings(t) = holdings(t) -- tables)
      holdings.filterInPlace((_, held) => held.nonEmpty)
      notifyAll()
    }

    def withTables[A](tables: Set[String])(f: => A): A = {
      claim(tables)
      try f finally release(tables)
    }

    def claimedNow: Set[String] = synchronized(claimed.toSet)
  }

  /** `Parallelsperre` per-level exclusive lock — a flagged module runs
    * alone on its level, unflagged peers share it
    * (`ParallelLockManager.cs:86-557`, queues `QueueManager.cs`): a fair
    * read-write lock per level gives the same FIFO announce/wait/release
    * protocol (normal = read, exclusive = write).
    */
  final class ParallelLocks {
    private val locks = TrieMap.empty[String, ReentrantReadWriteLock]

    private def lockFor(level: String): ReentrantReadWriteLock =
      locks.getOrElseUpdate(level, new ReentrantReadWriteLock(true))

    def withModule[A](level: String, parallelsperre: Boolean)(f: => A): A = {
      val l = lockFor(level)
      val lock = if (parallelsperre) l.writeLock() else l.readLock()
      scala.concurrent.blocking(lock.lock())
      try f finally lock.unlock()
    }
  }

  /** Per-realization step cap — `Anzahl_Parallele_Schritte`
    * (`Realization.cs:108-203`).
    */
  final class StepCap(maxParallelSteps: Int)
      extends ThreadCap(math.max(1, maxParallelSteps))
}
