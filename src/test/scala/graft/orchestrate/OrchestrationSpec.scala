package graft.orchestrate

import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Concurrency-stress tests for the orchestration primitives (SURVEY
  * §7.5: preserve observable semantics — exclusive runs, FIFO fairness,
  * per-table exclusion, parallel caps, shared DAG execution).
  */
class OrchestrationSpec extends AnyFunSuite {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  test("PackageDag: every package runs exactly once, predecessors first") {
    val order = new ConcurrentLinkedQueue[Long]()
    val counts = new AtomicInteger(0)
    // diamond: 4 <- {2,3} <- 1 ; plus 5 <- {2} shares 2's execution
    val deps = Map[Long, Seq[Long]](1L -> Seq(2, 3), 2L -> Seq(4), 3L -> Seq(4), 5L -> Seq(2))
      .withDefaultValue(Seq.empty)
    val dag = new PackageDag(deps, id => { order.add(id); counts.incrementAndGet(); () })
    Await.result(Future.sequence(Seq(dag.execute(1), dag.execute(5))), 30.seconds)
    val seq = order.asScala.toSeq
    assert(seq.count(_ == 4) == 1 && seq.count(_ == 2) == 1, "shared execution")
    assert(seq.indexOf(4) < seq.indexOf(2))
    assert(seq.indexOf(4) < seq.indexOf(3))
    assert(seq.indexOf(2) < seq.indexOf(1) && seq.indexOf(3) < seq.indexOf(1))
    assert(seq.indexOf(2) < seq.indexOf(5))
  }

  test("PackageDag: predecessor failure propagates to every waiter") {
    val deps = Map[Long, Seq[Long]](1L -> Seq(3), 2L -> Seq(3)).withDefaultValue(Seq.empty)
    val dag = new PackageDag(deps,
      id => if (id == 3L) throw new RuntimeException("boom") else ())
    val f1 = dag.execute(1)
    val f2 = dag.execute(2)
    assertThrows[RuntimeException] { Await.result(f1, 30.seconds) }
    assertThrows[RuntimeException] { Await.result(f2, 30.seconds) }
  }

  test("PackageDag: cycles fail fast instead of hanging") {
    val deps = Map[Long, Seq[Long]](1L -> Seq(2), 2L -> Seq(3), 3L -> Seq(1)).withDefaultValue(Seq.empty)
    val dag = new PackageDag(deps, _ => ())
    assertThrows[EtlStateException] { dag.execute(1) }
  }

  test("PackageDag: cycle detection is linear on diamond chains (r10 review: the path-only seen set was 2^n)") {
    // 60 stacked diamonds: pkg 3k depends on 3k+1 and 3k+2, both on
    // 3(k+1) — exponential traversal would hang for ~2^60 visits
    val n = 60
    val deps = (0 until n).flatMap { k =>
      val (top, a, b, bottom) = (3L * k, 3L * k + 1, 3L * k + 2, 3L * (k + 1))
      Seq(top -> Seq(a, b), a -> Seq(bottom), b -> Seq(bottom))
    }.toMap.withDefaultValue(Seq.empty[Long])
    val ran = new AtomicInteger(0)
    val dag = new PackageDag(deps, _ => { ran.incrementAndGet(); () })
    Await.result(dag.execute(0), 30.seconds) // completes ⇒ linear
    assert(ran.get == 3 * n + 1)
  }

  test("PackageDag: Long ids 2^32 apart do not alias (r10 review: the Int-keyed memo silently skipped one)") {
    val a = 5L
    val b = 5L + (1L << 32)
    val ran = new ConcurrentLinkedQueue[Long]()
    val dag = new PackageDag(Map(a -> Seq(b)).withDefaultValue(Seq.empty),
      id => { ran.add(id); () })
    Await.result(dag.execute(a), 30.seconds)
    assert(ran.asScala.toSeq == Seq(b, a), s"both ids must execute, got ${ran.asScala.toSeq}")
  }

  test("PriorityBarrier: a group is a TRUE barrier — a fast failure still awaits the slow sibling (r10 review)") {
    val slowDone = new AtomicInteger(0)
    val f = PriorityBarrier.run(Seq(1 -> "fail", 1 -> "slow")) {
      case "fail" => Future.failed(new RuntimeException("boom"))
      case _ => Future { Thread.sleep(300); slowDone.incrementAndGet(); () }
    }
    assertThrows[RuntimeException] { Await.result(f, 30.seconds) }
    assert(slowDone.get == 1,
      "the barrier future resolved before the in-flight sibling finished")
  }

  test("PriorityBarrier: same priority concurrent, different priority sequential") {
    val events = new ConcurrentLinkedQueue[String]()
    val inFlight = new AtomicInteger(0)
    val maxConcurrent = new AtomicInteger(0)
    def exec(name: String): Future[Unit] = Future {
      val n = inFlight.incrementAndGet()
      maxConcurrent.updateAndGet(m => math.max(m, n))
      events.add(s"start:$name")
      Thread.sleep(50)
      events.add(s"end:$name")
      inFlight.decrementAndGet()
      ()
    }
    val items = Seq(1 -> "a1", 1 -> "a2", 2 -> "b1", 2 -> "b2", 3 -> "c1")
    Await.result(PriorityBarrier.run(items)(exec), 30.seconds)
    val seq = events.asScala.toSeq
    // all of priority 1 ends before any of priority 2 starts
    assert(seq.indexOf("end:a1") < seq.indexOf("start:b1"))
    assert(seq.indexOf("end:a2") < seq.indexOf("start:b1"))
    assert(seq.indexOf("end:b1") < seq.indexOf("start:c1"))
    assert(seq.indexOf("end:b2") < seq.indexOf("start:c1"))
    assert(maxConcurrent.get() >= 2, "same-priority items overlapped")
  }

  test("PriorityBarrier: a failing group blocks later groups") {
    val ran = new ConcurrentLinkedQueue[String]()
    val items = Seq(1 -> "a", 2 -> "b")
    val f = PriorityBarrier.run(items) { name =>
      if (name == "a") Future.failed(new RuntimeException("boom"))
      else Future { ran.add(name); () }
    }
    assertThrows[RuntimeException] { Await.result(f, 30.seconds) }
    Thread.sleep(100)
    assert(!ran.asScala.toSeq.contains("b"))
  }

  test("ThreadCap bounds concurrency") {
    val cap = new Gates.ThreadCap(3)
    val inFlight = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val fs = (1 to 20).map(_ => Future(cap.withSlot {
      val n = inFlight.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, n))
      Thread.sleep(20)
      inFlight.decrementAndGet()
    }))
    Await.result(Future.sequence(fs), 30.seconds)
    assert(maxSeen.get() <= 3)
  }

  test("TableLocks: steps touching a shared table are mutually exclusive; disjoint sets overlap") {
    val locks = new Gates.TableLocks
    val active = new AtomicReference(Set.empty[String])
    val overlapped = new AtomicReference(false)
    def step(name: String, tables: Set[String]) = Future(locks.withTables(tables) {
      val before = active.getAndUpdate(_ + name)
      // a and b share table t1 and must never be active together
      if ((name == "a" && before.contains("b")) || (name == "b" && before.contains("a")))
        throw new IllegalStateException("mutual exclusion violated")
      if (before.contains("c") && (name == "a" || name == "b")) overlapped.set(true)
      if (name == "c" && (before.contains("a") || before.contains("b"))) overlapped.set(true)
      Thread.sleep(30)
      active.getAndUpdate(_ - name)
    })
    val fs = (1 to 8).flatMap(_ => Seq(
      step("a", Set("t1", "t2")), step("b", Set("t1", "t3")), step("c", Set("t4"))))
    Await.result(Future.sequence(fs), 30.seconds)
    assert(overlapped.get(), "disjoint table sets should have overlapped")
  }

  test("TableLocks: FIFO under contention — grants in arrival order (QueueManager.cs:583-712)") {
    val locks = new Gates.TableLocks
    val grants = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    // hold the table so every later claimant queues behind it
    locks.claim(Set("hot"))
    val threads = (1 to 12).map { i =>
      val t = new Thread(() => locks.withTables(Set("hot")) { grants.add(i); () })
      t.start()
      // let claimant i enter the wait before i+1 arrives (ticket order)
      Thread.sleep(30)
      t
    }
    locks.release(Set("hot"))
    threads.foreach(_.join(5000))
    assert(grants.size == 12)
    assert(grants.toArray.toSeq == (1 to 12), s"grant order was ${grants.toArray.toSeq}")
  }

  test("TableLocks: a waiting claim passes disjoint claims but blocks later conflicting ones") {
    val locks = new Gates.TableLocks
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    locks.claim(Set("a"))
    val waiter = new Thread(() => locks.withTables(Set("a", "b")) { order.add("waiter"); () })
    waiter.start()
    Thread.sleep(50) // waiter queued on {a,b}
    val done = new java.util.concurrent.CountDownLatch(1)
    new Thread(() => locks.withTables(Set("c")) { done.countDown() }).start()
    assert(done.await(2, TimeUnit.SECONDS), "disjoint {c} must pass while {a,b} waits")
    // "b" is FREE right now, but the earlier {a,b} waiter wants it —
    // a late {b} claim must not barge past it
    val late = new Thread(() => locks.withTables(Set("b")) { order.add("late"); () })
    late.start()
    Thread.sleep(50)
    locks.release(Set("a"))
    waiter.join(5000); late.join(5000)
    assert(order.toArray.toSeq == Seq("waiter", "late"))
  }

  test("TableLocks: an interrupted waiter leaves no stale ticket behind (ADVICE r3)") {
    val locks = new Gates.TableLocks
    locks.claim(Set("t"))
    val interrupted = new java.util.concurrent.CountDownLatch(1)
    val victim = new Thread(() => try locks.claim(Set("t")) catch {
      case _: InterruptedException => interrupted.countDown()
    })
    victim.start()
    Thread.sleep(50) // victim is queued and waiting
    victim.interrupt()
    assert(interrupted.await(2, TimeUnit.SECONDS), "victim did not see the interrupt")
    locks.release(Set("t"))
    // the abandoned ticket must not block a later conflicting claim
    val done = new java.util.concurrent.CountDownLatch(1)
    new Thread(() => locks.withTables(Set("t")) { done.countDown() }).start()
    assert(done.await(2, TimeUnit.SECONDS), "stale ticket of the interrupted waiter blocks the table")
  }

  test("TableLocks: claiming while holding throws instead of deadlocking (ADVICE r3)") {
    val locks = new Gates.TableLocks
    locks.claim(Set("x"))
    // under FIFO fairness a second claim could queue behind a waiter
    // that is blocked on "x" — refuse it outright
    intercept[IllegalStateException] { locks.claim(Set("y")) }
    locks.release(Set("x"))
    locks.withTables(Set("y")) { () } // released -> claiming again is fine
  }

  test("ParallelLocks: a Parallelsperre module runs alone on its level") {
    val locks = new Gates.ParallelLocks
    val readers = new AtomicInteger(0)
    val violations = new AtomicInteger(0)
    val writerActive = new AtomicReference(false)
    val fs = (1 to 30).map { i =>
      val exclusive = i % 5 == 0
      Future(locks.withModule("package-level", exclusive) {
        if (exclusive) {
          writerActive.set(true)
          if (readers.get() != 0) violations.incrementAndGet()
          Thread.sleep(10)
          writerActive.set(false)
        } else {
          readers.incrementAndGet()
          if (writerActive.get()) violations.incrementAndGet()
          Thread.sleep(5)
          readers.decrementAndGet()
        }
      })
    }
    Await.result(Future.sequence(fs), 30.seconds)
    assert(violations.get() == 0)
  }

  test("StepCap bounds per-realization step parallelism") {
    val cap = new Gates.StepCap(2)
    val inFlight = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val latch = new CountDownLatch(10)
    val fs = (1 to 10).map(_ => Future(cap.withSlot {
      val n = inFlight.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, n))
      Thread.sleep(15)
      inFlight.decrementAndGet()
      latch.countDown()
    }))
    Await.result(Future.sequence(fs), 30.seconds)
    assert(latch.await(1, TimeUnit.SECONDS))
    assert(maxSeen.get() <= 2)
  }
}
