package graft.macros

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import scala.util.matching.Regex

/** `##placeholder##` macro expansion — the reference's textual
  * substitution pass applied to every step command before execution
  * (`/root/reference/code/DIZService.Core/Helper.cs:3152-3242`, regex
  * `3241`). Pure string → string; the engine runs it before handing SQL
  * text to `spark.sql` or a JDBC source, exactly where the reference runs
  * it before ADO.NET. Unknown placeholders throw (the reference's
  * NYIException).
  */
object Macros {

  /** Everything a placeholder can resolve to — the reference pulls these
    * from the Workflow object + the 4-level prozesslaeufe tuple
    * (`Helper.cs:3156-3216`).
    */
  final case class Context(
      workflowId: Long,
      takeoverVon: LocalDateTime,
      takeoverBis: LocalDateTime,
      /** `Belegungszeit` — the run's requested timestamp; substituted as a
        * quoted SQL literal like the reference's `'{ts}'` (`Helper.cs:3183`).
        */
      belegungszeit: Option[LocalDateTime] = None,
      prozesslaeufeId: Option[Long] = None,
      zeitplanAusfuehrungenId: Option[Long] = None,
      etlProzesslaeufeId: Option[Long] = None,
      etlPaketProzesslaeufeId: Option[Long] = None,
      etlPaketumsetzungProzesslaeufeId: Option[Long] = None,
      etlPaketschrittProzesslaeufeId: Option[Long] = None,
      debug: Boolean = false)

  private val Placeholder: Regex = "##\\s*([^#]+?)\\s*##".r
  private val Ymd = DateTimeFormatter.ofPattern("yyyyMMdd")
  private val SqlTs = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  final class UnknownPlaceholderException(name: String)
    extends RuntimeException(s"Found a placeholder that was not implemented yet: ##$name##")

  /** Expand all known placeholders in `command`. Missing optional context
    * for a referenced placeholder is an error (the reference would NPE /
    * write an empty string; we fail fast).
    */
  def expand(command: String, ctx: Context): String = {
    def need[A](o: Option[A], name: String): A =
      o.getOrElse(throw new IllegalArgumentException(s"##$name## referenced but not available"))

    Placeholder.replaceAllIn(command, m => Regex.quoteReplacement(m.group(1) match {
      case "Belegungszeit" => s"'${need(ctx.belegungszeit, "Belegungszeit").format(SqlTs)}'"
      case "Uebernahme_von" => ctx.takeoverVon.format(Ymd)
      case "Uebernahme_bis" => ctx.takeoverBis.format(Ymd)
      case "Workflow_ID" => ctx.workflowId.toString
      case "Prozesslaeufe_ID" => need(ctx.prozesslaeufeId, "Prozesslaeufe_ID").toString
      case "Zeitplan_ID" => need(ctx.zeitplanAusfuehrungenId, "Zeitplan_ID").toString
      case "ETL_Prozesslaeufe_ID" => need(ctx.etlProzesslaeufeId, "ETL_Prozesslaeufe_ID").toString
      case "ETL_Paket_Prozesslaeufe_ID" =>
        need(ctx.etlPaketProzesslaeufeId, "ETL_Paket_Prozesslaeufe_ID").toString
      case "ETL_Paketumsetzung_Prozesslaeufe_ID" =>
        need(ctx.etlPaketumsetzungProzesslaeufeId, "ETL_Paketumsetzung_Prozesslaeufe_ID").toString
      case "ETL_Paketschritt_Prozesslaeufe_ID" =>
        need(ctx.etlPaketschrittProzesslaeufeId, "ETL_Paketschritt_Prozesslaeufe_ID").toString
      case "Debug" => if (ctx.debug) "True" else "False"
      case other => throw new UnknownPlaceholderException(other)
    }))
  }

  /** The placeholder names [[expand]] understands (for validation UIs). */
  val known: Set[String] = Set(
    "Belegungszeit", "Uebernahme_von", "Uebernahme_bis", "Workflow_ID",
    "Prozesslaeufe_ID", "Zeitplan_ID", "ETL_Prozesslaeufe_ID",
    "ETL_Paket_Prozesslaeufe_ID", "ETL_Paketumsetzung_Prozesslaeufe_ID",
    "ETL_Paketschritt_Prozesslaeufe_ID", "Debug")
}
