package graft.schedule

import java.time.{DayOfWeek, LocalDateTime, LocalTime, Month}

/** Schedule definition — the engine-side model of the reference's
  * `pc.ETL_Zeitplaene` row (`/root/reference/res/pc/ETL_Zeitplaene.sql`):
  * start/end date, start time, interval, day/week repetition counts,
  * per-weekday and per-month masks, week-of-month, last-of-month and the
  * run-immediately flag. Pure data; all calculus lives in [[NextRun]].
  */
final case class Schedule(
    interval: Interval,
    /** `Anfangsdatum` — first possible execution; its time-of-day (usually
      * midnight) intentionally leaks into the last-of-month / week-of-month
      * candidates, exactly like the reference (`Scheduler.cs:1806-1809`,
      * `1669-1672`).
      */
    anfangsdatum: LocalDateTime,
    /** `Startzeit` — time-of-day for interval stepping and theoretical
      * starts.
      */
    startzeit: LocalTime,
    /** `Endedatum` — no execution after this instant (Manuell only, as in
      * the reference where only `GetNextExecutionDate` checks it,
      * `Scheduler.cs:1208-1217`).
      */
    endedatum: Option[LocalDateTime] = None,
    /** `Sofort_Ausfuehrung` — run immediately on first-ever scheduling. */
    sofortAusfuehrung: Boolean = false,
    /** `Tageswiederholung` — executions per day (0 = use week repetition). */
    tageswiederholung: Int = 0,
    /** `Wochenwiederholung` — executions per week (used when day rep = 0). */
    wochenwiederholung: Int = 0,
    /** `Monatsletzter` — also fire on the last day of the month. */
    monatsletzter: Boolean = false,
    /** `Woche_des_Monats` — restrict to the n-th Monday-aligned week (1-5,
      * 0 = off).
      */
    wocheDesMonats: Int = 0,
    /** `An_jedem_Tag` / `In_jedem_Monat` — masks disabled. */
    anJedemTag: Boolean = true,
    inJedemMonat: Boolean = true,
    /** `Montag`..`Sonntag` flags (only consulted when !anJedemTag). */
    wochentage: Set[DayOfWeek] = DayOfWeek.values.toSet,
    /** `Januar`..`Dezember` flags (only consulted when !inJedemMonat). */
    monate: Set[Month] = Month.values.toSet)

/** `conf.Zeitplan_Intervalle` — the 9 interval types
  * (`Scheduler.cs:829-891`).
  */
sealed abstract class Interval(val name: String)
object Interval {
  case object Manuell extends Interval("Manuell")
  case object Minute extends Interval("Minute")
  case object DreiMinuten extends Interval("DreiMinuten")
  case object Viertelstuendlich extends Interval("Viertelstuendlich")
  case object Stunde extends Interval("Stunde")
  case object Taeglich extends Interval("Täglich")
  case object Woche extends Interval("Woche")
  case object Monat extends Interval("Monat")
  case object Jaehrlich extends Interval("Jährlich")

  val all: Seq[Interval] = Seq(Manuell, Minute, DreiMinuten,
    Viertelstuendlich, Stunde, Taeglich, Woche, Monat, Jaehrlich)
  def byName(n: String): Interval =
    all.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown interval: $n"))
}

/** Raised when a schedule cannot produce another run — the reference's
  * end-date cutoff (`Scheduler.cs:1208-1217`) and empty-mask errors.
  */
final class ScheduleException(msg: String) extends RuntimeException(msg)
