package graft.report

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.ledger.RunLedger
import graft.model._
import graft.steps.{CommandType, TaskType}
import graft.testkit.SparkSupport

/** Report views over a multi-run ledger — last-run ranking and error
  * drill-down (the monitoring queries q07/q09 mirror in shape).
  */
class ReportsSpec extends AnyFunSuite with SparkSupport {

  private def multiRunLedger(): RunLedger = {
    var t = LocalDateTime.of(2026, 4, 1, 8, 0)
    val ledger = new RunLedger(() => t)
    // workflow 1: two runs, second failed; workflow 2: one run
    val r1 = ledger.start(RunLevel.Workflow, 1)
    ledger.markStarted(r1); ledger.markFinished(r1, success = true)
    t = t.plusHours(1)
    val r2 = ledger.start(RunLevel.Workflow, 1)
    ledger.markStarted(r2); ledger.markFinished(r2, success = false)
    ledger.error(ErrorRow.TypWorkflow, ErrorRow.SeverityMajor, "run 2 broke",
      workflowRunId = Some(r2))
    t = t.plusHours(1)
    val r3 = ledger.start(RunLevel.Workflow, 2)
    ledger.markStarted(r3); ledger.markFinished(r3, success = true)
    ledger
  }

  test("lastRunPerWorkflow picks the latest end per workflow") {
    val ledger = multiRunLedger()
    val last = Reports.lastRunPerWorkflow(ledger.latest(spark))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(last == Map(1L -> false, 2L -> true)) // wf1's latest run failed
  }

  test("errorDrilldown joins errors to their workflow") {
    val ledger = multiRunLedger()
    val drill = Reports.errorDrilldown(ledger.errorsDf(spark), ledger.latest(spark))
      .collect()
    assert(drill.length == 1)
    assert(drill.head.getLong(0) == 1L) // workflow_id
    assert(drill.head.getString(3) == "run 2 broke")
  }

  test("json_log in the latest view is valid JSON carrying the row state") {
    val ledger = multiRunLedger()
    val row = Reports.timeline(ledger.latest(spark))
    assert(row.count() == 3)
    val json = ledger.latest(spark).selectExpr("json_log").head.getString(0)
    assert(json.startsWith("{") && json.contains("\"level\":\"workflow\""))
  }

  // ---- config-plane views ----

  private def miniConfig: ConfigSet = ConfigSet(
    workflows = Seq(WorkflowRow(1, 100, 10L, None, "nightly",
      uebernahmeVon = None, uebernahmeBis = None, uebernahmeTageRueckwirkend = None,
      parallelsperre = false, istAktiv = true)),
    pakete = Seq(
      PaketRow(10L, "master", parallelsperre = false, istAktiv = true),
      PaketRow(11L, "staging", parallelsperre = false, istAktiv = true)),
    abhaengigkeiten = Seq(AbhaengigkeitRow(1, 10L, 11L, istAktiv = true)),
    umsetzungen = Seq(UmsetzungRow(100L, 1, None, parallelsperre = false,
      istAktiv = true, umsetzungsname = "load")),
    paketUmsetzungen = Seq(PaketUmsetzungRow(1, 10L, 100L, 1, None)),
    schritte = Seq(
      SchrittRow(1000L, "prepare", TaskType.Sql, CommandType.SqlTarget, "SELECT 1",
        None, None, parallelsperre = false, zeitscheibe = false, istAktiv = true),
      SchrittRow(1001L, "inactive", TaskType.Sql, CommandType.Test, "1",
        None, None, parallelsperre = false, zeitscheibe = false, istAktiv = false)),
    umsetzungSchritte = Seq(
      UmsetzungSchrittRow(100L, 1000L, 1), UmsetzungSchrittRow(100L, 1001L, 2)),
    zeitplaene = Seq(ZeitplanRow(100, LocalDateTime.of(2026, 1, 1, 6, 0), None,
      "Täglich", "06:00:00", 0, 0, anJedemTag = true, inJedemMonat = true,
      wochentage = Seq.empty, monate = Seq.empty, wocheDesMonats = 0,
      monatsletzter = false, sofortAusfuehrung = true)),
    emailVerteiler = Seq(
      EmailVerteilerRow(1, "ops@x", nurFehler = false, cc = false, istAktiv = true),
      EmailVerteilerRow(1, "lead@x", nurFehler = true, cc = false, istAktiv = true),
      EmailVerteilerRow(1, "audit@x", nurFehler = false, cc = true, istAktiv = true),
      EmailVerteilerRow(1, "gone@x", nurFehler = false, cc = false, istAktiv = false),
      EmailVerteilerRow(2, "other@x", nurFehler = false, cc = false, istAktiv = true)))

  test("plannedRuns projects the schedule calculus forward (app/app.R:911-931)") {
    val now = LocalDateTime.of(2026, 4, 1, 8, 0)
    val runs = Reports.plannedRuns(miniConfig, now, perWorkflow = 3)
    assert(runs.map(_.plannedStart) == Seq(
      LocalDateTime.of(2026, 4, 2, 6, 0),
      LocalDateTime.of(2026, 4, 3, 6, 0),
      LocalDateTime.of(2026, 4, 4, 6, 0)))
    assert(runs.forall(r => r.workflowId == 1 && r.zeitplaeneId == 100))
    // a never-executed workflow's first projection honors Sofort_Ausfuehrung
    val sofort = Reports.plannedRuns(miniConfig, now, perWorkflow = 2,
      wasExecutedOnce = _ => false)
    assert(sofort.head.plannedStart == now)
  }

  test("workflowTree mirrors the Shiny recursive CTE (app/app.R:768-816)") {
    val tree = Reports.workflowTree(1, miniConfig)
    val byLabel = tree.map(t => t.label -> t).toMap
    assert(byLabel("W1").parent == " " && byLabel("W1").modulname == "nightly")
    assert(byLabel("P10").parent == "W1" && byLabel("P10").modulname == "master")
    // predecessor hangs under its dependent package, like the CTE's parent join
    assert(byLabel("P11").parent == "P10")
    assert(byLabel("R100").parent == "P10" && byLabel("R100").modulname == "load")
    assert(byLabel("S1000").parent == "R100")
    assert(!byLabel.contains("S1001"), "inactive steps are filtered like the CTE")
  }

  test("mail recipients: Nur_Fehler/CC/Ist_Aktiv selection (Workflow.cs:1296-1317)") {
    val rows = miniConfig.emailVerteiler
    val ok = MailReport.recipients(rows, 1, success = true)
    assert(ok.to == Seq("ops@x") && ok.cc == Seq("audit@x")) // lead@x only-on-error, gone@x inactive
    val failed = MailReport.recipients(rows, 1, success = false)
    assert(failed.to == Seq("ops@x", "lead@x") && failed.cc == Seq("audit@x"))
    assert(MailReport.shouldSend(success = false, MailReport.Recipients(Nil, Nil)))
    assert(!MailReport.shouldSend(success = true, MailReport.Recipients(Nil, Seq("cc@x"))))
  }
}
