package graft.orchestrate

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's only real test spec —
  * `DIZService.Tests/WorkflowmanagerTests.cs` — including the complete
  * negative transition matrix (`178-224`).
  */
class WorkflowManagerSpec extends AnyFunSuite {
  import WorkflowStage._

  private def fresh(): WorkflowManager = new WorkflowManager

  test("ExistsWorkflow (WorkflowmanagerTests.cs:36-46)") {
    val m = fresh()
    m.register(1, 1)
    assert(m.exists(1))
    assert(!m.exists(4))
  }

  test("stage listings through the full legal chain (57-106)") {
    val m = fresh()
    assert(m.scheduled.isEmpty && m.initializing.isEmpty && m.executing.isEmpty &&
      m.finished.isEmpty && m.failed.isEmpty)

    m.register(1, 1)
    m.register(2, 2)
    assert(m.scheduled == Seq(1, 2))

    m.scheduledToInitializing(1)
    assert(m.scheduled == Seq(2) && m.initializing == Seq(1))

    m.initializingToExecuting(1)
    assert(m.initializing.isEmpty && m.executing == Seq(1))

    m.executingToFinished(1)
    assert(m.executing.isEmpty && m.finished == Seq(1))

    m.scheduledToInitializing(2)
    m.initializingToExecuting(2)
    m.setFailed(2)
    assert(m.scheduled.isEmpty && m.initializing.isEmpty && m.executing.isEmpty)
    assert(m.finished == Seq(1) && m.failed == Seq(2))
  }

  test("retrieval by stage + error on illegal access (109-144)") {
    val m = fresh()
    m.register(1, 1)
    assert(m.stage(1) == Scheduled)
    assertThrows[EtlStateException] { m.zeitplanAusfuehrungenId(3) }
    m.scheduledToInitializing(1)
    assert(!m.is(Scheduled, 1))
    assert(m.is(Initializing, 1))
  }

  test("neutralise clears every trace (147-166)") {
    val m = fresh()
    m.register(1, 1)
    m.neutralise(1)
    assert(m.scheduled.isEmpty && m.initializing.isEmpty && m.executing.isEmpty &&
      m.finished.isEmpty && m.failed.isEmpty)
    assert(m.mapping.isEmpty)
    assert(!m.exists(1))
    assert(!m.existsMapping(1))
  }

  test("negative transition matrix (178-224)") {
    val m = fresh()
    m.register(1, 1)

    // scheduled: cannot execute, finish, or re-schedule
    assertThrows[EtlStateException] { m.initializingToExecuting(1) }
    assertThrows[EtlStateException] { m.executingToFinished(1) }
    assertThrows[EtlStateException] { m.setScheduled(1) }

    // initializing: cannot schedule, finish, re-initialize, or neutralise
    m.scheduledToInitializing(1)
    assertThrows[EtlStateException] { m.setScheduled(1) }
    assertThrows[EtlStateException] { m.executingToFinished(1) }
    assertThrows[EtlStateException] { m.scheduledToInitializing(1) }
    assertThrows[EtlStateException] { m.neutralise(1) }

    // executing: cannot schedule, initialize, re-execute, or neutralise
    m.initializingToExecuting(1)
    assertThrows[EtlStateException] { m.setScheduled(1) }
    assertThrows[EtlStateException] { m.scheduledToInitializing(1) }
    assertThrows[EtlStateException] { m.initializingToExecuting(1) }
    assertThrows[EtlStateException] { m.neutralise(1) }

    // finished: cannot initialize, execute, re-finish, or neutralise
    m.executingToFinished(1)
    assertThrows[EtlStateException] { m.scheduledToInitializing(1) }
    assertThrows[EtlStateException] { m.initializingToExecuting(1) }
    assertThrows[EtlStateException] { m.executingToFinished(1) }
    assertThrows[EtlStateException] { m.neutralise(1) }

    // failed: cannot initialize, execute, finish, or neutralise
    m.setScheduled(1)
    m.scheduledToInitializing(1)
    m.initializingToExecuting(1)
    m.setFailed(1)
    assertThrows[EtlStateException] { m.scheduledToInitializing(1) }
    assertThrows[EtlStateException] { m.initializingToExecuting(1) }
    assertThrows[EtlStateException] { m.executingToFinished(1) }
    assertThrows[EtlStateException] { m.neutralise(1) }
  }

  test("GetWorkflowStage through the chain incl. failure recovery (227-260)") {
    val m = fresh()
    assert(m.stage(1) == Unknown)
    m.register(1, 1)
    assert(m.stage(1) == Scheduled)
    m.scheduledToInitializing(1)
    assert(m.stage(1) == Initializing)
    m.initializingToExecuting(1)
    assert(m.stage(1) == Executing)
    assert(m.stage(2) == Unknown)
    m.setFailed(1)
    assert(m.stage(1) == Failed)
    m.setScheduled(1)
    m.scheduledToInitializing(1)
    m.initializingToExecuting(1)
    m.executingToFinished(1)
    assert(m.stage(1) == Finished)
  }

  test("IsWorkflow per stage (263-294)") {
    val m = fresh()
    assert(m.is(Unknown, 1))
    m.register(1, 1)
    assert(m.is(Scheduled, 1))
    m.scheduledToInitializing(1)
    assert(m.is(Initializing, 1))
    m.initializingToExecuting(1)
    assert(m.is(Executing, 1))
    assert(m.is(Unknown, 2))
    m.setFailed(1)
    assert(m.is(Failed, 1))
    m.setScheduled(1)
    m.scheduledToInitializing(1)
    m.initializingToExecuting(1)
    m.executingToFinished(1)
    assert(m.is(Finished, 1))
  }

  test("executed-once tracking (297-323)") {
    val m = fresh()
    m.register(1, 1)
    assert(!m.wasExecutedOnce(1))
    assert(!m.wasExecutedOnce(2))
    m.scheduledToInitializing(1)
    m.initializingToExecuting(1)
    m.setFailed(1)
    assert(m.wasExecutedOnce(1))
    assert(!m.wasExecutedOnce(2))
    m.setScheduled(1)
    m.scheduledToInitializing(1)
    m.initializingToExecuting(1)
    m.executingToFinished(1)
    assert(m.wasExecutedOnce(1))
    assert(!m.wasExecutedOnce(2))
  }

  test("zeitplan mapping add/remove/duplicate errors (332-347)") {
    val m = fresh()
    m.register(1, 1)
    assert(m.mapping == Map(1 -> 1))
    m.addMapping(2, 1)
    assertThrows[EtlStateException] { m.addMapping(1, 2) }
    assertThrows[EtlStateException] { m.removeMapping(3) }
    assertThrows[EtlStateException] { m.zeitplanAusfuehrungenId(3) }
    m.removeMapping(1)
  }

  test("failure after finish flips terminal state (SetWorkflowFailed default branch)") {
    val m = fresh()
    m.register(1, 1)
    m.scheduledToInitializing(1)
    m.initializingToExecuting(1)
    m.executingToFinished(1)
    m.setFailed(1) // from terminal: logs only, then marks failed
    assert(m.stage(1) == Failed)
    assert(m.finished.isEmpty)
  }
}
