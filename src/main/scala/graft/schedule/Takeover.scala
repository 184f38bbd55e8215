package graft.schedule

import java.time.{LocalDateTime, LocalTime}

/** Takeover-window calculus (`/root/reference/code/DIZService.Core/
  * Workflow.cs:590-658`): per run, compute the `[from, to]` data window
  * that feeds `##Uebernahme_von##`/`##Uebernahme_bis##` macros and
  * timeslice predicates. Pure function of the workflow config + clock.
  */
object Takeover {

  /** `pc.ETL_Workflow`'s takeover columns: either an explicit from(-to)
    * pair, or a relative look-back in days. The table CHECK constraint
    * enforces exactly one of the two shapes.
    */
  final case class Config(
      uebernahmeVon: Option[LocalDateTime] = None,
      uebernahmeBis: Option[LocalDateTime] = None,
      uebernahmeTageRueckwirkend: Option[Int] = None)

  /** Resolve the window at `now` for a run requested at `requestedAt`
    * (the `Anforderungszeitpunkt` fallback for an open-ended explicit
    * window, `Workflow.cs:628-640`). Relative mode is day-aligned:
    * `to` = today 23:59:59, `from` = (to - n days) at 00:00:00
    * (`Workflow.cs:612-619`).
    */
  def window(cfg: Config, now: LocalDateTime, requestedAt: LocalDateTime): (LocalDateTime, LocalDateTime) =
    cfg.uebernahmeVon match {
      case None =>
        val days = cfg.uebernahmeTageRueckwirkend.getOrElse(
          throw new IllegalArgumentException(
            "takeover config needs Uebernahme_von or Uebernahme_Tage_Rueckwirkend"))
        val to = now.toLocalDate.atTime(LocalTime.of(23, 59, 59))
        val from = to.minusDays(days.toLong).toLocalDate.atStartOfDay()
        (from, to)
      case Some(von) =>
        (von, cfg.uebernahmeBis.getOrElse(requestedAt))
    }
}
