package graft.steps

/** Step definition — the engine-side row of `pc.ETL_Paketschritte`
  * (`/root/reference/res/pc/ETL_Paketschritte.sql`): command type CHECK ∈
  * {EXEC, SQL_TARGET, SQL_SOURCE, COPY, TRANSFER, TEST}, task type CHECK
  * ∈ {SQL, EXCEL, CSV}, the command text, comma-separated target tables,
  * the timeslice + exclusive-lock flags, and (for CSV export) the 7
  * format parameters from `pc.ETL_Paketschritt_Parameter`.
  */
final case class StepSpec(
    id: Long,
    befehlstyp: String, // CommandType.*
    aufgabentyp: String, // TaskType.*
    /** SQL text (COPY/SQL_*), directory (TRANSFER), seconds (TEST). */
    befehl: String,
    /** `Zieltabelle` — comma-separated target tables; the first is the
      * write target, all are claimed in the table mutex (`Step.cs:449-469`).
      */
    zieltabelle: Option[String] = None,
    /** `QUELLTABELLE` — schema-drift column (SURVEY §1.2 ⚠), only used
      * for table-mutex claims.
      */
    quelltabelle: Option[String] = None,
    zeitscheibe: Boolean = false,
    parallelsperre: Boolean = false,
    schrittReihenfolge: Int = 0,
    csv: CsvParams = CsvParams())

object CommandType {
  val Exec = "EXEC"
  val SqlTarget = "SQL_TARGET"
  val SqlSource = "SQL_SOURCE"
  val Copy = "COPY"
  val Transfer = "TRANSFER"
  val Test = "TEST"
  val all: Seq[String] = Seq(Exec, SqlTarget, SqlSource, Copy, Transfer, Test)
}

object TaskType {
  val Sql = "SQL"
  val Excel = "EXCEL"
  val Csv = "CSV"
  /** Our addition in the reference's own option style (like
    * `CsvParams.einzeldatei`): a COPY whose Befehl names a registered
    * [[Transforms]] curation transform instead of SQL text — the
    * reference's step surface is SQL-only because its engine is a SQL
    * database; a Spark engine's native operators (span removal, mixture
    * rates, semantic stages) need a step type of their own to run under
    * the same orchestration/ledger/mutex machinery. Macro expansion,
    * Zieltabelle write lifecycle, audit columns and `ErwarteteDaten`
    * accounting are identical to COPY/SQL. Command values are
    * whitespace-free unless double-quoted (`key="a b"` — quotes
    * stripped, [[Transforms.parse]]).
    */
  val Pipeline = "PIPELINE"
  /** TRANSFER ingest over line-delimited JSON (r14) — the interchange
    * format raw training-data drops arrive in; same per-file lifecycle,
    * mapping rename, audit columns and idempotent rollback as the CSV
    * path (the [[graft.steps.Steps.FileReader]] slot is the only
    * difference, like EXCEL). */
  val Jsonl = "JSONL"
  /** A COPY whose Befehl names a registered [[StreamTransforms]]
    * streaming transform (r13): the step starts a Structured Streaming
    * query, drains it (`Trigger.AvailableNow` — the scheduler-tick
    * reading of an always-on component), and records the admitted rows
    * as `ErwarteteDaten`; a stream failure is a step failure, so
    * cascade + fallback semantics apply unchanged. Same command syntax
    * and quoting as PIPELINE.
    */
  val Stream = "STREAM"
  /** A COPY whose Befehl names a warehouse MAINTENANCE action (r13):
    * `compact` / `optimize_zorder` on the step's own Zieltabelle. The
    * maintained table IS the Zieltabelle by construction — not a
    * command parameter — so the orchestrator's table mutex
    * ([[graft.orchestrate.Gates.TableLocks]], claimed from
    * `StepSpec.claimedTables` like every step) covers the action's
    * stats-to-rewrite window structurally: as long as writers go
    * through steps, `optimizeZOrder`'s "no concurrent writers"
    * assumption (ADVICE r12) is enforced by the same machinery that
    * serializes the reference's table writes (`Step.cs:449-469`).
    * Contents are unchanged by contract (the q109 gate hash-checks
    * that); file counts land in the message log. Same command syntax
    * and quoting as PIPELINE.
    */
  val Maintenance = "MAINTENANCE"
  val all: Seq[String] = Seq(Sql, Excel, Csv, Pipeline, Stream, Maintenance)
}

/** The 7 CSV format options of `pc.ETL_Paketschritt_Parameter`
  * (`res/pc/ETL_Paketschritt_Parameter.sql`, read in
  * `CommandExecuter.cs:2191-2237`): header, delimiter, number format,
  * date format, quote, escape, null representation. Defaults mirror the
  * reference's writer defaults. `einzeldatei` is our addition in the same
  * option style: the reference always writes one file (its consumers
  * expect a single CSV), but forcing every extract through one task is
  * the classic 100 TB bottleneck — so single-file is opt-in and the
  * default is a directory of part files.
  */
final case class CsvParams(
    kopfzeile: Boolean = true,
    trennzeichen: String = ";",
    zahlenformat: Option[String] = None,
    datumsformat: String = "yyyy-MM-dd HH:mm:ss",
    textqualifizierer: Option[String] = Some("\""),
    escapecharacter: String = "\\",
    leerwert: String = "",
    einzeldatei: Boolean = false)

/** All target+source tables a step touches — the table-mutex claim set
  * (`Step.cs:449-469,519-538`).
  */
object StepSpec {
  def claimedTables(s: StepSpec): Set[String] =
    (split(s.zieltabelle) ++ split(s.quelltabelle)).toSet

  private def split(o: Option[String]): Seq[String] =
    o.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
}
