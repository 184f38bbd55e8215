package graft.report

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.ledger.RunLedger
import graft.model.{ErrorRow, RunLevel}
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
}
