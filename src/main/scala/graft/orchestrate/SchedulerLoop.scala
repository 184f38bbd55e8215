package graft.orchestrate

import java.time.LocalDateTime

import scala.collection.mutable

import graft.schedule.{NextRun, Schedule, ScheduleException}

/** The scheduler poll loop (`Processor.cs:1110-1168`,
  * `Scheduler.cs:23-533`): every tick, compute each active workflow's
  * next run via the pure calculus, record the planned execution
  * (`pc.ETL_Zeitplan_Ausfuehrungen` row), and start workflows due
  * within the tick horizon. Re-creates finished/failed workflows for
  * their next slot and deactivates a workflow after 10 consecutive
  * scheduling failures (`Processor.cs:168-214`).
  *
  * Pure driver-side logic with an injected clock + executor — the test
  * drives ticks manually; production wraps [[tick]] in a 10 s
  * ScheduledExecutorService.
  */
final class SchedulerLoop(
    manager: WorkflowManager,
    execute: (Int, Long, LocalDateTime) => Unit,
    tickSeconds: Int = 10,
    maxStrikes: Int = 10,
    /** When present, every computed plan materializes as a
      * `pc.ETL_Zeitplan_Ausfuehrungen` row ([[graft.model.PlanRow]]) and
      * its ledger id becomes the run's `zeitplanAusfuehrungenId` — the
      * persistence that makes service-restart recovery possible
      * (`Worker.cs:45-51`). Without it the loop falls back to a local
      * counter (pure unit-test mode).
      */
    ledger: Option[graft.ledger.RunLedger] = None) {

  final case class Entry(
      workflowId: Int,
      schedule: Schedule,
      zeitplanId: Int,
      var active: Boolean = true,
      var strikes: Int = 0,
      var plannedAt: Option[LocalDateTime] = None,
      var planId: Option[Long] = None)

  private val entries = mutable.LinkedHashMap.empty[Int, Entry]
  private var nextZeitplanAusfuehrungenId = 1L

  def register(workflowId: Int, schedule: Schedule, zeitplanId: Int = 0): Unit =
    synchronized {
      // re-registration supersedes: a pending materialized plan of the
      // old entry is closed (Ausgefuehrt=1) instead of orphaned as a
      // phantom open plan only restart recovery would neutralize (r10
      // review)
      entries.get(workflowId).foreach(old =>
        old.planId.foreach(pid => ledger.foreach(_.markPlanExecuted(pid))))
      entries(workflowId) = Entry(workflowId, schedule, zeitplanId)
    }

  def deactivate(workflowId: Int): Unit = synchronized {
    entries.get(workflowId).foreach(_.active = false)
  }

  def isActive(workflowId: Int): Boolean = synchronized {
    entries.get(workflowId).exists(_.active)
  }

  def planned: Map[Int, LocalDateTime] = synchronized {
    entries.values.flatMap(e => e.plannedAt.map(e.workflowId -> _)).toMap
  }

  /** One poll: refresh next-run times, start everything due within the
    * tick horizon. Returns the workflow ids started this tick.
    */
  def tick(now: LocalDateTime): Seq[Int] = {
    val due = synchronized {
      entries.values.filter(_.active).flatMap { e =>
        try {
          // a materialized plan stays pending until CONSUMED — the
          // reference starts every open row regardless of lateness
          // (`Scheduler.cs:552` GetAllWorkflowsToStart filters only
          // `Startzeitpunkt IS NULL AND Ausgefuehrt = 0`), so a tick
          // delayed past plannedAt runs the plan late instead of
          // superseding it with a fresh row (which would orphan the old
          // one as a phantom open plan — ADVICE r5)
          val next = e.plannedAt match {
            case Some(p) => p // still pending (possibly overdue)
            case None => NextRun.nextRun(e.schedule, now,
              manager.wasExecutedOnce(e.workflowId))
          }
          if (!e.plannedAt.contains(next)) {
            // a NEW plan: materialize the Zeitplan_Ausfuehrungen row
            e.planId = ledger.map(_.planExecution(e.workflowId, e.zeitplanId, next))
          }
          e.plannedAt = Some(next)
          // strikes do NOT reset here: a successful plan COMPUTATION
          // says nothing about whether the workflow can start (r10
          // review — an executor that throws every time would have its
          // strike wiped each tick and never hit the cutoff); they reset
          // after a successful execute launch below
          if (next.isBefore(now.plusSeconds(tickSeconds.toLong))) Some(e) else None
        } catch {
          case _: ScheduleException =>
            // end-date exhausted etc: strike, deactivate after maxStrikes
            e.strikes += 1
            if (e.strikes >= maxStrikes) e.active = false
            None
        }
      }.toSeq
    }
    due.flatMap { e =>
      val zid = synchronized {
        val z = e.planId match {
          case Some(pid) =>
            ledger.foreach(_.markPlanExecuted(pid)) // Ausgefuehrt = 1
            pid
          case None =>
            val n = nextZeitplanAusfuehrungenId
            nextZeitplanAusfuehrungenId += 1
            n
        }
        e.plannedAt = None // consumed; next tick recomputes
        e.planId = None
        z
      }
      // a throwing executor must not kill the host poll loop, and a
      // workflow whose creation keeps failing must hit the 10-strike
      // cutoff (`Processor.cs:168-214`) — previously the exception
      // escaped tick(), terminated the service, and the strike counter
      // never saw it (r10 review). The consumed plan stays consumed (the
      // failed start is on the record); the next tick plans afresh.
      scala.util.Try(execute(e.workflowId, zid, now)) match {
        case scala.util.Success(_) =>
          synchronized { e.strikes = 0 }
          Some(e.workflowId)
        case scala.util.Failure(err) =>
          synchronized {
            e.strikes += 1
            if (e.strikes >= maxStrikes) e.active = false
          }
          ledger.foreach(_.error(graft.model.ErrorRow.TypWorkflow,
            graft.model.ErrorRow.SeverityMajor,
            s"workflow ${e.workflowId} failed to start: ${err.getMessage}",
            stacktrace = Some(err.getStackTrace.mkString("\n"))))
          None
      }
    }
  }
}
