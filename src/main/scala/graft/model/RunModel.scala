package graft.model

import java.time.LocalDateTime

/** Run-ledger model — the engine-side shape of the reference's 4
  * mirror-shaped `Logging` run tables (the ETL_*_Prozesslaeufe DDL under
  * `/root/reference/res/logging/`): request/start/exec-start/
  * exec-end/end timestamps, the 4 flags, and the per-step
  * `ErwarteteDaten` row count. One case class covers all 4 levels (the
  * reference duplicates the shape per table; `level` + nullable parent
  * ids encode the hierarchy relationally, which is also the partition
  * key a 100 TB ledger would use).
  */
final case class RunRow(
    level: String, // RunLevel.*
    id: Long,
    /** Version counter — the ledger is append-only; the highest seq per
      * id is the current state (the Spark-native re-expression of the
      * reference's UPDATE + Json_Log regeneration, `Helper.cs:2492-2672`).
      */
    seq: Int,
    /** Config-plane reference: ETL_Workflow_ID / ETL_Pakete_ID /
      * ETL_Paket_Umsetzungen_ID / ETL_Paketschritte_ID.
      */
    refId: Long,
    workflowRunId: Option[Long],
    paketRunId: Option[Long],
    umsetzungRunId: Option[Long],
    zeitplanAusfuehrungenId: Option[Long],
    anforderungszeitpunkt: LocalDateTime,
    startzeitpunkt: Option[LocalDateTime],
    ausfuehrungsstartzeitpunkt: Option[LocalDateTime],
    ausfuehrungsendzeitpunkt: Option[LocalDateTime],
    endzeitpunkt: Option[LocalDateTime],
    istGestartet: Boolean,
    istAbgeschlossen: Boolean,
    erfolgreich: Boolean,
    parallelsperre: Boolean,
    /** `ErwarteteDaten` — rows the step moved (step level only). */
    erwarteteDaten: Option[Long])

object RunLevel {
  val Workflow = "workflow"
  val Paket = "paket"
  val Umsetzung = "paketumsetzung"
  val Schritt = "paketschritt"
  val all: Seq[String] = Seq(Workflow, Paket, Umsetzung, Schritt)
}

/** `Logging.ETL_Meldungen` (message log). */
final case class MessageRow(
    id: Long,
    workflowRunId: Option[Long],
    paketRunId: Option[Long],
    umsetzungRunId: Option[Long],
    schrittRunId: Option[Long],
    meldungstext: String,
    anlagedatum: LocalDateTime)

/** `Logging.ETL_Fehlermeldungen` (error log); Fehlertyp CHECK ∈
  * {Dienst, SQL, Workflow}, Schweregrad minor/major.
  */
final case class ErrorRow(
    id: Long,
    workflowRunId: Option[Long],
    paketRunId: Option[Long],
    umsetzungRunId: Option[Long],
    schrittRunId: Option[Long],
    fehlertyp: String,
    schweregrad: String,
    meldungstext: String,
    stacktrace: Option[String],
    anlagedatum: LocalDateTime)

object ErrorRow {
  val TypDienst = "Dienst"
  val TypSql = "SQL"
  val TypWorkflow = "Workflow"
  val SeverityMinor = "minor"
  val SeverityMajor = "major"
}

/** `pc.ETL_Zeitplan_Ausfuehrungen` — one MATERIALIZED planned execution
  * per (workflow, planned instant). `ausgefuehrt` flips to true when the
  * run starts, and the service neutralizes every still-open row at both
  * start and stop (`Worker.cs:45-51` / `StopAsync`: `UPDATE … SET
  * Ausgefuehrt = 1 WHERE Ausgefuehrt = 0`) so a crashed service's stale
  * plans never fire after restart — the scheduler re-creates fresh rows
  * from the calculus instead.
  */
final case class PlanRow(
    id: Long,
    etlWorkflowId: Int,
    etlZeitplaeneId: Int,
    geplanterStart: LocalDateTime,
    ausgefuehrt: Boolean,
    letzteAenderung: LocalDateTime)

/** `Logging.ETL_SQL_Anfragen` (executed-query log — DDL is drift in the
  * reference, reconciled per SURVEY §1.2).
  */
final case class QueryRow(
    id: Long,
    schrittRunId: Option[Long],
    konfigurationenId: Option[Long],
    sql: String,
    anlagedatum: LocalDateTime)
