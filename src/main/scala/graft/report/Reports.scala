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
}
