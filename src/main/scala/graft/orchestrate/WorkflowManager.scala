package graft.orchestrate

import scala.collection.mutable

/** The 6 lifecycle stages of a workflow (`/root/reference/code/
  * DIZService.Core/WorkflowManager.cs:8-16`).
  */
sealed trait WorkflowStage
object WorkflowStage {
  case object Unknown extends WorkflowStage
  case object Scheduled extends WorkflowStage
  case object Initializing extends WorkflowStage
  case object Executing extends WorkflowStage
  case object Failed extends WorkflowStage
  case object Finished extends WorkflowStage
}

/** Raised on illegal state transitions / lookups — the engine's
  * equivalent of the reference's ETLException.
  */
final class EtlStateException(msg: String) extends RuntimeException(msg)

/** Workflow state machine — stage lists, legal/illegal transitions and
  * the schedule-run mapping, re-expressed from `WorkflowManager.cs:
  * 439-1053` (transitions), `1055-1339` (stage queries), `1341-1373`
  * (run-once tracking), `1375-1529` (zeitplan mapping). The reference
  * guards each list with its own SemaphoreSlim; one monitor gives the
  * same observable atomicity without the lock zoo (SURVEY §7.5).
  *
  * Deliberately preserved reference semantics:
  *  - stage priority when a workflow sits in several lists is
  *    Scheduled > Initializing > Executing > Failed > Finished
  *    (`1055-1117`);
  *  - `setFailed` from a terminal/unknown stage only logs, it does not
  *    throw (`824-851` default case);
  *  - re-scheduling after Failed/Finished does NOT clear the old terminal
  *    state — `neutralise` and the next terminal transition do;
  *  - `executingToFinished` removes the schedule mapping and throws if it
  *    is absent (`930-1010`), so a second finish without a fresh mapping
  *    fails — the scheduler re-maps every run.
  */
final class WorkflowManager {
  import WorkflowStage._

  private val scheduledL = mutable.ArrayBuffer.empty[Int]
  private val initializingL = mutable.ArrayBuffer.empty[Int]
  private val executingL = mutable.ArrayBuffer.empty[Int]
  private val failedL = mutable.ArrayBuffer.empty[Int]
  private val finishedL = mutable.ArrayBuffer.empty[Int]
  private val executedOnce = mutable.LinkedHashSet.empty[Int]
  private val zeitplanMapping = mutable.LinkedHashMap.empty[Int, Long]

  /** Constructor-equivalent of `new Workflow(...)` which schedules itself
    * and registers its schedule-run mapping (`Workflow.cs` ctor →
    * `SetWorkflowScheduled` + `AddMapping`).
    */
  def register(id: Int, zeitplanAusfuehrungenId: Long): Unit = synchronized {
    setScheduledLocked(id)
    addMappingLocked(id, zeitplanAusfuehrungenId)
  }

  /** `SetWorkflowScheduled` (`439-487`): legal from Unknown, Failed,
    * Finished; a live stage throws.
    */
  def setScheduled(id: Int): Unit = synchronized(setScheduledLocked(id))

  private def setScheduledLocked(id: Int): Unit = {
    val st = stageLocked(id)
    if (st == Initializing || st == Executing || st == Scheduled)
      throw new EtlStateException(s"Workflow $id has a bad state ($st) to set scheduled")
    scheduledL += id
  }

  /** `NeutraliseWorkflow` (`494-653`): only a Scheduled workflow can be
    * neutralised; clears every trace of it (stage lists + mapping).
    */
  def neutralise(id: Int): Unit = synchronized {
    if (stageLocked(id) != Scheduled)
      throw new EtlStateException(s"Workflow $id is not scheduled -> cannot remove scheduled state")
    scheduledL -= id
    finishedL -= id
    failedL -= id
    removeMappingLocked(id)
  }

  /** `SetWorkflowScheduledToInitializing` (`655-733`). */
  def scheduledToInitializing(id: Int): Unit = synchronized {
    if (!scheduledL.contains(id))
      throw new EtlStateException(s"Workflow $id is not scheduled")
    if (initializingL.contains(id))
      throw new EtlStateException(s"Workflow $id is already initializing")
    scheduledL -= id
    initializingL += id
  }

  /** `SetWorkflowInitializingToExecuting` (`735-822`). */
  def initializingToExecuting(id: Int): Unit = synchronized {
    if (!initializingL.contains(id))
      throw new EtlStateException(s"Workflow $id is not initializing")
    if (executingL.contains(id))
      throw new EtlStateException(s"Workflow $id is already executing")
    initializingL -= id
    executingL += id
  }

  /** `SetWorkflowFailed` (`824-928`): removes the live stage (terminal /
    * unknown stages only log), marks failed + executed, clears finished.
    */
  def setFailed(id: Int): Unit = synchronized {
    stageLocked(id) match {
      case Scheduled    => scheduledL -= id
      case Initializing => initializingL -= id
      case Executing    => executingL -= id
      case other        => () // reference logs "no state to set to failed"
    }
    if (!failedL.contains(id)) failedL += id
    finishedL -= id
    executedOnce += id
  }

  /** `SetWorkflowExecutingToFinished` (`930-1010`). */
  def executingToFinished(id: Int): Unit = synchronized {
    if (!executingL.contains(id))
      throw new EtlStateException(s"There is no workflow executing with ID $id")
    if (!finishedL.contains(id)) finishedL += id
    failedL -= id
    executedOnce += id
    executingL -= id
    removeMappingLocked(id)
  }

  /** `GetWorkflowStage` (`1055-1183`) — fixed priority order. */
  def stage(id: Int): WorkflowStage = synchronized(stageLocked(id))

  private def stageLocked(id: Int): WorkflowStage =
    if (scheduledL.contains(id)) Scheduled
    else if (initializingL.contains(id)) Initializing
    else if (executingL.contains(id)) Executing
    else if (failedL.contains(id)) Failed
    else if (finishedL.contains(id)) Finished
    else Unknown

  /** `IsWorkflow` (`1185-1339`): membership in the given stage list;
    * Unknown means "in no list".
    */
  def is(st: WorkflowStage, id: Int): Boolean = synchronized {
    st match {
      case Scheduled    => scheduledL.contains(id)
      case Initializing => initializingL.contains(id)
      case Executing    => executingL.contains(id)
      case Failed       => failedL.contains(id)
      case Finished     => finishedL.contains(id)
      case Unknown      => stageLocked(id) == Unknown
    }
  }

  def exists(id: Int): Boolean = synchronized(stageLocked(id) != Unknown)

  def scheduled: Seq[Int] = synchronized(scheduledL.toSeq)
  def initializing: Seq[Int] = synchronized(initializingL.toSeq)
  def executing: Seq[Int] = synchronized(executingL.toSeq)
  def failed: Seq[Int] = synchronized(failedL.toSeq)
  def finished: Seq[Int] = synchronized(finishedL.toSeq)

  /** `WasExecutedOnce` (`1341-1373`) — gates `Sofort_Ausfuehrung`. */
  def wasExecutedOnce(id: Int): Boolean = synchronized(executedOnce.contains(id))

  /** `AddMapping` (`1375-1424`): duplicate workflow id throws (duplicate
    * target value is fine).
    */
  def addMapping(id: Int, zeitplanAusfuehrungenId: Long): Unit =
    synchronized(addMappingLocked(id, zeitplanAusfuehrungenId))

  private def addMappingLocked(id: Int, zid: Long): Unit = {
    if (zeitplanMapping.contains(id))
      throw new EtlStateException(s"Workflow $id already has a zeitplan mapping")
    zeitplanMapping(id) = zid
  }

  /** `RemoveMapping` (`1426-1471`): unknown id throws. */
  def removeMapping(id: Int): Unit = synchronized(removeMappingLocked(id))

  private def removeMappingLocked(id: Int): Unit = {
    if (!zeitplanMapping.contains(id))
      throw new EtlStateException(s"No zeitplan mapping for workflow $id")
    zeitplanMapping -= id
  }

  def existsMapping(id: Int): Boolean = synchronized(zeitplanMapping.contains(id))

  /** `GetZeitplanAusfuehrungenID` (`1505-1529`): unknown id throws. */
  def zeitplanAusfuehrungenId(id: Int): Long = synchronized {
    zeitplanMapping.getOrElse(id,
      throw new EtlStateException(s"No zeitplan mapping for workflow $id"))
  }

  def mapping: Map[Int, Long] = synchronized(zeitplanMapping.toMap)
}
