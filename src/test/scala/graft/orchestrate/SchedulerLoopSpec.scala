package graft.orchestrate

import java.time.{LocalDateTime, LocalTime}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.schedule.{Interval, Schedule}

class SchedulerLoopSpec extends AnyFunSuite {

  private val base = LocalDateTime.of(2026, 3, 2, 9, 0, 0)

  private def minutely(start: LocalDateTime) =
    Schedule(Interval.Minute, start, start.toLocalTime)

  test("due workflows start within the tick horizon; future ones wait") {
    val started = mutable.ArrayBuffer.empty[(Int, Long)]
    val loop = new SchedulerLoop(new WorkflowManager,
      (wf, zid, _) => started += ((wf, zid)), tickSeconds = 10)
    loop.register(1, minutely(base))                 // due at 09:00
    loop.register(2, minutely(base.plusMinutes(5)))  // due at 09:05
    val startedIds = loop.tick(base)
    assert(startedIds == Seq(1))
    assert(started.map(_._1).toSeq == Seq(1))
    // planned time recorded for the not-yet-due workflow
    assert(loop.planned.get(2).contains(base.plusMinutes(5)))
  }

  test("zeitplan execution ids are unique and increasing across ticks") {
    val started = mutable.ArrayBuffer.empty[(Int, Long)]
    val loop = new SchedulerLoop(new WorkflowManager,
      (wf, zid, _) => started += ((wf, zid)), tickSeconds = 10)
    loop.register(1, minutely(base))
    loop.tick(base)
    loop.tick(base.plusMinutes(1))
    loop.tick(base.plusMinutes(2))
    assert(started.map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("a workflow whose schedule is exhausted strikes out and deactivates (Processor.cs:168-214)") {
    val loop = new SchedulerLoop(new WorkflowManager, (_, _, _) => (),
      tickSeconds = 10, maxStrikes = 3)
    val dead = Schedule(Interval.Manuell, base.minusYears(1), LocalTime.of(9, 0),
      endedatum = Some(base.minusMonths(1)))
    loop.register(5, dead)
    (1 to 2).foreach(i => loop.tick(base.plusMinutes(i.toLong)))
    assert(loop.isActive(5))
    loop.tick(base.plusMinutes(3))
    assert(!loop.isActive(5)) // third strike
  }

  test("a plan missed by a delayed tick runs LATE under its original row — never superseded into a phantom open plan (ADVICE r5)") {
    val ledger = new graft.ledger.RunLedger(() => base)
    val started = mutable.ArrayBuffer.empty[(Int, Long)]
    val loop = new SchedulerLoop(new WorkflowManager,
      (wf, zid, _) => started += ((wf, zid)), tickSeconds = 10, ledger = Some(ledger))
    loop.register(1, minutely(base))
    // tick mid-minute: the 09:01:00 run is PLANNED (not due at 09:00:30)
    assert(loop.tick(base.plusSeconds(30)).isEmpty)
    assert(ledger.openPlans.size == 1)
    val plannedId = ledger.openPlans.head.id
    // the next tick arrives LATE (a long synchronous execute delayed the
    // loop past the planned instant): the plan fires under its own id —
    // the reference starts every open row regardless of lateness
    // (Scheduler.cs:552 filters only Startzeitpunkt IS NULL AND
    // Ausgefuehrt = 0)
    assert(loop.tick(base.plusMinutes(5)) == Seq(1))
    assert(started.toSeq == Seq((1, plannedId)))
    // consumed, not orphaned: zero open plans, exactly one row total
    assert(ledger.openPlans.isEmpty)
    assert(ledger.allPlans.count(_.etlWorkflowId == 1) == 1)
  }

  test("Sofort_Ausfuehrung fires immediately on first registration only") {
    val mgr = new WorkflowManager
    val started = mutable.ArrayBuffer.empty[Int]
    val loop = new SchedulerLoop(mgr, (wf, zid, _) => {
      started += wf
      // simulate a completed run for run-once tracking
      if (!mgr.existsMapping(wf)) mgr.register(wf, zid) else mgr.setScheduled(wf)
      mgr.scheduledToInitializing(wf)
      mgr.initializingToExecuting(wf)
      mgr.executingToFinished(wf)
    }, tickSeconds = 10)
    // weekly schedule anchored far in the future, but sofort
    loop.register(7, Schedule(Interval.Woche, base.plusDays(3), LocalTime.of(9, 0),
      sofortAusfuehrung = true))
    assert(loop.tick(base) == Seq(7))   // fired immediately
    assert(loop.tick(base.plusMinutes(1)).isEmpty) // now follows the schedule
  }

  test("a throwing executor does not kill the tick loop; it strikes out and deactivates (r10 review)") {
    val good = mutable.ArrayBuffer.empty[Int]
    val loop = new SchedulerLoop(new WorkflowManager,
      (wf, _, _) => if (wf == 9) throw new RuntimeException("bad config") else good += wf,
      tickSeconds = 10, maxStrikes = 3)
    loop.register(9, minutely(base))
    loop.register(1, minutely(base))
    (1 to 3).foreach { i =>
      // tick must survive workflow 9's throw, and workflow 1 keeps running
      val ids = loop.tick(base.plusMinutes(i.toLong))
      assert(ids == Seq(1), s"tick $i started $ids")
    }
    assert(!loop.isActive(9), "three failed launches must deactivate")
    assert(loop.isActive(1))
    assert(good.size == 3)
  }

  test("re-registration supersedes a pending materialized plan instead of orphaning it (r10 review)") {
    val ledger = new graft.ledger.RunLedger(() => base)
    val loop = new SchedulerLoop(new WorkflowManager, (_, _, _) => (),
      tickSeconds = 10, ledger = Some(ledger))
    loop.register(1, minutely(base.plusMinutes(5)))
    loop.tick(base) // plans the 09:05 row, not yet due
    assert(ledger.openPlans.size == 1)
    loop.register(1, minutely(base.plusMinutes(30))) // schedule change
    assert(ledger.openPlans.isEmpty,
      "the superseded plan row must be closed, not left as a phantom open plan")
  }
}
