package graft.model

import java.time.LocalDateTime

/** Control-plane config rows — the engine-side `pc.*`/`conf.*` schema
  * per FIXTURES.md §2 (reconciled: includes the `Quelltabelle` column
  * the reference reads but never declared, SURVEY §7.5). German column
  * concepts kept as field names for parity with the DDL under
  * `/root/reference/res/pc/`.
  */
final case class WorkflowRow(
    etlWorkflowId: Int,
    etlZeitplaeneId: Int,
    etlPaketeId: Long,
    etlFallbackPaketeId: Option[Long],
    workflowname: String,
    uebernahmeVon: Option[LocalDateTime],
    uebernahmeBis: Option[LocalDateTime],
    uebernahmeTageRueckwirkend: Option[Int],
    parallelsperre: Boolean,
    istAktiv: Boolean)

final case class PaketRow(
    etlPaketeId: Long,
    paketname: String,
    parallelsperre: Boolean,
    istAktiv: Boolean)

/** `pc.ETL_Paket_Abhaengigkeiten` — DAG edges per workflow. */
final case class AbhaengigkeitRow(
    etlWorkflowId: Int,
    etlPaketeId: Long,
    vorlaufEtlPaketeId: Long,
    istAktiv: Boolean)

final case class UmsetzungRow(
    etlPaketUmsetzungenId: Long,
    anzahlParalleleSchritte: Int,
    etlKonfigurationenId: Option[Long],
    parallelsperre: Boolean,
    istAktiv: Boolean,
    /** `Umsetzungsname` — shown in the config-tree view. */
    umsetzungsname: String = "")

/** `pc.ETL_Pakete_Paketumsetzungen` — package × realization with
  * priority group and tenant.
  */
final case class PaketUmsetzungRow(
    etlWorkflowId: Int,
    etlPaketeId: Long,
    etlPaketUmsetzungenId: Long,
    paketPriorisierung: Int,
    mandantenId: Option[Int],
    /** The DDL's `Ist_aktiv` — the reference filters the MAPPING's flag
      * (`Package.cs:511` `ab.Ist_Aktiv = 1`) in addition to the
      * realization's own; a deactivated assignment must not execute
      * even while the realization stays active elsewhere (r10 review).
      */
    istAktiv: Boolean = true)

final case class SchrittRow(
    etlPaketschritteId: Long,
    schrittname: String,
    aufgabentyp: String,
    befehlstyp: String,
    befehl: String,
    zieltabelle: Option[String],
    quelltabelle: Option[String],
    parallelsperre: Boolean,
    zeitscheibe: Boolean,
    istAktiv: Boolean)

/** `pc.ETL_Paketumsetzungen_Paketschritte` — realization × step with
  * order.
  */
final case class UmsetzungSchrittRow(
    etlPaketUmsetzungenId: Long,
    etlPaketschritteId: Long,
    schrittReihenfolge: Int,
    /** `ETL_Workflow_ID` — the reference scopes step assignments per
      * workflow (`Realization.cs:646`); None = unscoped (applies to
      * every workflow, the pre-r10 snapshot shape).
      */
    etlWorkflowId: Option[Int] = None,
    /** The mapping's own `Ist_aktiv` (`Realization.cs:647`). */
    istAktiv: Boolean = true)

/** `pc.ETL_Zeitplaene` — flattened weekday/month masks. */
final case class ZeitplanRow(
    etlZeitplaeneId: Int,
    anfangsdatum: LocalDateTime,
    endedatum: Option[LocalDateTime],
    /** Interval name from `conf.Zeitplan_Intervalle` (Manuell, Minute,
      * DreiMinuten, Viertelstuendlich, Stunde, Täglich, Woche, Monat,
      * Jährlich).
      */
    zeitplanIntervall: String,
    /** `Startzeit` as "HH:mm:ss" — the reference's DDL stores a time
      * string it parses at read time (`Scheduler.cs:948-952`); keeping
      * it textual also keeps the row Dataset-encodable (Spark has no
      * TIME type).
      */
    startzeit: String,
    tageswiederholung: Int,
    wochenwiederholung: Int,
    anJedemTag: Boolean,
    inJedemMonat: Boolean,
    /** ISO day-of-week numbers (1=Mo..7=So) with the flag set. */
    wochentage: Seq[Int],
    /** Month numbers (1..12) with the flag set. */
    monate: Seq[Int],
    wocheDesMonats: Int,
    monatsletzter: Boolean,
    sofortAusfuehrung: Boolean)

/** `pc.ETL_Paketschritt_Parameter` — CSV format options per step
  * (`einzeldatei` is this engine's single-file-output extension in the
  * same option style).
  */
final case class SchrittParameterRow(
    etlPaketschritteId: Long,
    kopfzeile: Option[Boolean],
    trennzeichen: Option[String],
    zahlenformat: Option[String],
    datumsformat: Option[String],
    textqualifizierer: Option[String],
    escapecharacter: Option[String],
    leerwert: Option[String],
    einzeldatei: Option[Boolean] = None)

/** `conf.Konfigurationsparameter` — service-level name/value parameters
  * (`Helper.cs:300-430` ReadConfigurations): `Anzahl_ETL_Threads`,
  * `Debug`, `LogInterval`; unknown names are carried but ignored, and a
  * malformed value falls back to the default like the reference's
  * per-row catch.
  */
final case class KonfigurationsparameterRow(
    parametername: String,
    parameterwert: String)

/** `pc.ETL_Konfigurationen` — a named configuration pointing at its
  * LOGICAL source and target connections
  * (`res/pc/ETL_Konfigurationen.sql`; read in `Step.cs:1352-1404`).
  */
final case class KonfigurationRow(
    etlKonfigurationenId: Long,
    konfiguration: String,
    quellEtlVerbindungenId: Long,
    zielEtlVerbindungenId: Long,
    istAktiv: Boolean)

/** `pc.ETL_Mandanten_Verbindungen` — the tenant indirection: (logical
  * connection, Mandant) → physical data connection
  * (`res/pc/ETL_Mandanten_Verbindungen.sql`; read in
  * `Step.cs:1450-1516`). This is what lets the same configuration run
  * against a different database per tenant.
  */
final case class MandantVerbindungRow(
    mandantenId: Int,
    etlVerbindungenId: Long,
    datenverbindungenId: Long)

/** `conf.Datenverbindungen` — the physical connection. The reference's
  * host/port/instance/credential columns (`res/conf/Datenverbindungen
  * .sql`) collapse into the Spark-side
  * [[graft.sources.Connections.Spec]] variants (parquet dir, CSV drop,
  * JDBC url+credentials).
  */
final case class DatenverbindungRow(
    datenverbindungenId: Long,
    verbindung: String,
    spec: graft.sources.Connections.Spec)

/** Parquet-flat form of [[DatenverbindungRow]] for config snapshots on
  * disk: the `Connections.Spec` ADT has no Dataset encoder, so the
  * snapshot stores the reference-DDL-shaped columns and `typ` selects
  * the variant at load time ("parquet" | "csv" | "jdbc" — the engine's
  * `conf.Datenquellentypen` vocabulary).
  */
final case class DatenverbindungFlatRow(
    datenverbindungenId: Long,
    verbindung: String,
    typ: String,
    /** parquet/csv base directory (`Verbindungszeichenkette` analog). */
    pfad: Option[String] = None,
    url: Option[String] = None,
    benutzer: Option[String] = None,
    kennwort: Option[String] = None,
    treiber: Option[String] = None) {

  def toRow: DatenverbindungRow = {
    import graft.sources.Connections
    val spec = typ match {
      case "parquet" => Connections.ParquetDir(pfad.getOrElse(
        throw new IllegalArgumentException(s"Datenverbindung $datenverbindungenId: parquet needs pfad")))
      case "csv" => Connections.CsvDir(pfad.getOrElse(
        throw new IllegalArgumentException(s"Datenverbindung $datenverbindungenId: csv needs pfad")))
      case "jdbc" => Connections.Jdbc(
        url.getOrElse(throw new IllegalArgumentException(
          s"Datenverbindung $datenverbindungenId: jdbc needs url")),
        benutzer.getOrElse(""), kennwort.getOrElse(""), treiber)
      case other => throw new IllegalArgumentException(
        s"Datenverbindung $datenverbindungenId: unknown typ '$other'")
    }
    DatenverbindungRow(datenverbindungenId, verbindung, spec)
  }
}

/** `conf.Email_Verteiler_Workflow` — per-workflow mail recipients with
  * the only-on-error and CC routing flags (`Workflow.cs:1296-1317`).
  */
final case class EmailVerteilerRow(
    etlWorkflowId: Int,
    empfaenger: String,
    nurFehler: Boolean,
    cc: Boolean,
    istAktiv: Boolean)

/** The full config snapshot an engine instance schedules from. */
final case class ConfigSet(
    workflows: Seq[WorkflowRow],
    pakete: Seq[PaketRow],
    abhaengigkeiten: Seq[AbhaengigkeitRow],
    umsetzungen: Seq[UmsetzungRow],
    paketUmsetzungen: Seq[PaketUmsetzungRow],
    schritte: Seq[SchrittRow],
    umsetzungSchritte: Seq[UmsetzungSchrittRow],
    zeitplaene: Seq[ZeitplanRow] = Seq.empty,
    schrittParameter: Seq[SchrittParameterRow] = Seq.empty,
    emailVerteiler: Seq[EmailVerteilerRow] = Seq.empty,
    konfigurationen: Seq[KonfigurationRow] = Seq.empty,
    mandantenVerbindungen: Seq[MandantVerbindungRow] = Seq.empty,
    datenverbindungen: Seq[DatenverbindungRow] = Seq.empty,
    konfigurationsparameter: Seq[KonfigurationsparameterRow] = Seq.empty)
