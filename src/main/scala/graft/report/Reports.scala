package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monitoring/report views over the run ledger — the engine-side
  * re-expression of the reference's mail report + Shiny queries
  * (`Helper.cs:606-1292`, `app/app.R:262-931`). The reference UNIONs 4
  * mirror tables; our ledger already carries `level`, so the union shape
  * is inherent and each view is one plan over the latest-state frame.
  */
object Reports {

  /** Per-run timeline — the 4-level UNION the mail report and `timevis`
    * panel build (`Helper.cs:915-1112`, `app/app.R:824-898`): level, ids,
    * start/end, duration, success.
    */
  def timeline(latest: DataFrame): DataFrame =
    latest.select(
      col("level"), col("id"), col("refId"),
      col("workflowRunId"),
      col("startzeitpunkt").as("start"),
      col("endzeitpunkt").as("ende"),
      (unix_timestamp(col("endzeitpunkt")) - unix_timestamp(col("startzeitpunkt")))
        .as("dauer_sec"),
      col("istAbgeschlossen"), col("erfolgreich"), col("erwarteteDaten"))

  /** Last run per workflow — the `MAX(Endzeitpunkt)` CTE
    * (`app/app.R:327-368`) as a ranked window.
    */
  def lastRunPerWorkflow(latest: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("refId"))
      .orderBy(col("endzeitpunkt").desc_nulls_last, col("id").desc)
    latest.filter(col("level") === "workflow")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("refId").as("workflow_id"),
        col("endzeitpunkt").as("last_end"), col("erfolgreich"))
  }

  /** Run-DAG rendering (`Vizualiser.cs:131-666` draws per-run PNGs; we
    * emit GraphViz DOT from the ledger instead — structure parity, no
    * pixel parity, per SURVEY §2.4): one node per run row (red when
    * failed), edges along the 4-level hierarchy.
    */
  def runDagDot(latestRows: Seq[graft.model.RunRow]): String = {
    def nodeId(r: graft.model.RunRow) = s"${r.level}_${r.id}"
    val nodes = latestRows.map { r =>
      val color = if (r.istAbgeschlossen && !r.erfolgreich) "red"
        else if (r.erfolgreich) "green" else "gray"
      s"""  ${nodeId(r)} [label="${r.level} #${r.refId}", color=$color];"""
    }
    val byId = latestRows.map(r => r.id -> r).toMap
    val edges = latestRows.flatMap { r =>
      val parent = r.level match {
        case graft.model.RunLevel.Paket => r.workflowRunId
        case graft.model.RunLevel.Umsetzung => r.paketRunId
        case graft.model.RunLevel.Schritt => r.umsetzungRunId
        case _ => None
      }
      parent.flatMap(byId.get).map(p => s"  ${nodeId(p)} -> ${nodeId(r)};")
    }
    (Seq("digraph run {") ++ nodes ++ edges ++ Seq("}")).mkString("\n")
  }

  /** Error drill-down (`app/app.R:447-486`, `AnalyzeWorkflowError`
    * `Helper.cs:915-1112`): errors joined to their workflow run.
    */
  def errorDrilldown(errors: DataFrame, latest: DataFrame): DataFrame =
    errors.join(
      latest.filter(col("level") === "workflow")
        .select(col("id").as("workflowRunId"), col("refId").as("workflow_id")),
      Seq("workflowRunId"), "left")
      .select(col("workflow_id"), col("fehlertyp"), col("schweregrad"),
        col("meldungstext"), col("anlagedatum"))

  // ---- config-plane views (Shiny parity over the ConfigSet snapshot) ----

  /** One projected execution of the planned-runs view. */
  final case class PlannedRun(
      workflowId: Int, zeitplaeneId: Int, plannedStart: java.time.LocalDateTime)

  /** Planned-runs view — the Shiny "Nächste Datenübernahme" panel
    * (`app/app.R:911-931` lists `pc.ETL_Zeitplan_Ausfuehrungen` rows with
    * `Ausgefuehrt = 0 AND Startzeitpunkt IS NULL`). The reference
    * pre-materializes those rows in the DB; this engine creates schedule
    * executions on the fly, so the equivalent view PROJECTS the next
    * `perWorkflow` instants per active workflow through the real schedule
    * calculus ([[graft.schedule.NextRun]]). `wasExecutedOnce` feeds the
    * `Sofort_Ausfuehrung` gate for the FIRST projection of each workflow;
    * later projections are by definition not-first.
    */
  def plannedRuns(
      cfg: graft.model.ConfigSet,
      now: java.time.LocalDateTime,
      perWorkflow: Int = 3,
      wasExecutedOnce: Int => Boolean = _ => true): Seq[PlannedRun] =
    cfg.workflows.filter(_.istAktiv).flatMap { wf =>
      cfg.zeitplaene.find(_.etlZeitplaeneId == wf.etlZeitplaeneId).toSeq.flatMap { z =>
        val sched = graft.catalog.ConfigAssembly.schedule(z)
        val out = scala.collection.mutable.ArrayBuffer.empty[PlannedRun]
        var t = now
        var first = true
        var exhausted = false
        var hops = 0
        while (out.size < perWorkflow && !exhausted && hops < 500) {
          hops += 1
          try {
            val n = graft.schedule.NextRun.nextRun(
              sched, t, wasExecutedOnce = if (first) wasExecutedOnce(wf.etlWorkflowId) else true)
            first = false
            if (out.nonEmpty && !n.isAfter(out.last.plannedStart)) {
              // the monatsletzter quirk can return a non-advancing PAST
              // instant (NextRun preserves it as reference spec) — a
              // naive t = n+1s re-asks the same instant forever and the
              // view filled every slot with one stale timestamp (r10
              // review); jump to the next midnight so the listing shows
              // distinct future slots
              t = t.toLocalDate.plusDays(1).atStartOfDay
            } else {
              out += PlannedRun(wf.etlWorkflowId, z.etlZeitplaeneId, n)
              t = n.plusSeconds(1)
            }
          } catch {
            // Endedatum passed — no executions left for this schedule
            case _: graft.schedule.ScheduleException => exhausted = true
          }
        }
        out.toSeq
      }
    }.sortBy(p => (p.plannedStart.toString, p.workflowId))

  /** One node of the config-tree view. */
  final case class TreeRow(id: Long, label: String, level: String, parent: String, modulname: String)

  /** Recursive workflow config tree — the Shiny nav-panel CTE
    * (`app/app.R:768-816`): W → master P → predecessor P* (each under its
    * DEPENDENT package, like the CTE's parent join) → R → S, labels
    * `W/P/R/S<id>`, inactive rows filtered where the CTE filters them.
    */
  def workflowTree(workflowId: Int, cfg: graft.model.ConfigSet): Seq[TreeRow] = {
    val wf = cfg.workflows.find(w => w.etlWorkflowId == workflowId && w.istAktiv)
      .getOrElse(throw new IllegalArgumentException(s"no active workflow $workflowId"))
    val wLabel = s"W$workflowId"
    val deps = cfg.abhaengigkeiten.filter(a => a.etlWorkflowId == workflowId && a.istAktiv)
    val out = scala.collection.mutable.ArrayBuffer.empty[TreeRow]
    val seenPkg = scala.collection.mutable.Set.empty[Long]
    out += TreeRow(workflowId.toLong, wLabel, "Workflow", " ", wf.workflowname)

    def addPackage(pid: Long, parent: String): Unit = if (seenPkg.add(pid)) {
      val label = s"P$pid"
      val name = cfg.pakete.find(_.etlPaketeId == pid).map(_.paketname).getOrElse(s"Paket $pid")
      out += TreeRow(pid, label, "Paket", parent, name)
      cfg.paketUmsetzungen
        .filter(m => m.etlWorkflowId == workflowId && m.etlPaketeId == pid)
        .foreach { m =>
          cfg.umsetzungen
            .find(u => u.etlPaketUmsetzungenId == m.etlPaketUmsetzungenId && u.istAktiv)
            .foreach { u =>
              val rLabel = s"R${u.etlPaketUmsetzungenId}"
              out += TreeRow(u.etlPaketUmsetzungenId, rLabel, "Umsetzung", label, u.umsetzungsname)
              cfg.umsetzungSchritte
                .filter(_.etlPaketUmsetzungenId == u.etlPaketUmsetzungenId)
                .sortBy(_.schrittReihenfolge)
                .foreach { us =>
                  cfg.schritte
                    .find(s => s.etlPaketschritteId == us.etlPaketschritteId && s.istAktiv)
                    .foreach(s => out += TreeRow(
                      s.etlPaketschritteId, s"S${s.etlPaketschritteId}", "Schritt", rLabel,
                      s.schrittname))
                }
            }
        }
      // predecessors hang under their dependent package (CTE parent join)
      deps.filter(_.etlPaketeId == pid).foreach(d => addPackage(d.vorlaufEtlPaketeId, label))
    }

    addPackage(wf.etlPaketeId, wLabel)
    out.toSeq
  }
}
