package graft.schedule

import java.time.{DayOfWeek, LocalDate, LocalDateTime, LocalTime, Month, YearMonth}

/** Pure next-run calculus — a faithful re-expression of the reference's
  * `Scheduler.cs:578-1965` (`GetExecTime` + the Manuell calendar path).
  * Zero Spark dependency; the orchestrator's 10 s poll loop calls
  * [[NextRun.nextRun]] per workflow. Observable quirks of the reference
  * are preserved on purpose (they are the spec):
  *
  *  - fixed intervals step the start time until it is >= now, with .NET
  *    AddMonths/AddYears day-clamping applied iteratively
  *    (`Scheduler.cs:829-891`);
  *  - only the Manuell path enforces `Endedatum` (`1208-1217`);
  *  - last-of-month and week-of-month candidates carry `Anfangsdatum`'s
  *    time-of-day, not `Startzeit` (`1806-1809`, `1669-1672`);
  *  - the last-of-month candidate may lie (slightly) in the past on the
  *    last day of a month (`1785-1829` never compares against `now`);
  *  - a week-of-month that starts past the month's end throws, except in
  *    December where the week-5 overflow lands in January < 12 and is not
  *    detected (`1879-1884`).
  */
object NextRun {

  /** Next execution instant for `schedule`, computed at `now`.
    * `wasExecutedOnce` is the workflow-manager's run-once tracking that
    * gates `Sofort_Ausfuehrung` (`Scheduler.cs:795-806`).
    */
  def nextRun(s: Schedule, now: LocalDateTime, wasExecutedOnce: Boolean = false): LocalDateTime = {
    if (s.sofortAusfuehrung && !wasExecutedOnce) return now
    try s.interval match {
      case Interval.Manuell => nextManuell(s, now)
      case fixed            => stepFixed(fixed, s.anfangsdatum.toLocalDate.atTime(s.startzeit), now)
    } catch {
      // a config that assembles an invalid date (monate={April} with a
      // day-31 seed builds LocalDate.of(y, APRIL, 31)) must surface as
      // the calculus's OWN exception: every caller's robustness path —
      // SchedulerLoop's 10-strike deactivation, Reports.plannedRuns's
      // per-workflow catch — handles ScheduleException only, so a raw
      // DateTimeException killed the whole poll loop for one workflow's
      // bad calendar (r10 review; the reference wraps the identical
      // failure in ETLException, Scheduler.cs:1456-1471)
      case e: java.time.DateTimeException =>
        throw new ScheduleException(s"invalid calendar configuration: ${e.getMessage}")
    }
  }

  /** Fixed-interval stepping (`GetExecTime`, `Scheduler.cs:829-891`):
    * advance `start` one interval at a time while it is strictly before
    * `now`. Iterative `plusMonths`/`plusYears` reproduces .NET's
    * day-clamp-then-keep-stepping behavior (Jan 31 → Feb 28 → Mar 28).
    */
  private def stepFixed(i: Interval, start0: LocalDateTime, now: LocalDateTime): LocalDateTime = {
    val step: LocalDateTime => LocalDateTime = i match {
      case Interval.Minute            => _.plusMinutes(1)
      case Interval.DreiMinuten       => _.plusMinutes(3)
      case Interval.Viertelstuendlich => _.plusMinutes(15)
      case Interval.Stunde            => _.plusHours(1)
      case Interval.Taeglich          => _.plusDays(1)
      case Interval.Woche             => _.plusDays(7)
      case Interval.Monat             => _.plusMonths(1)
      case Interval.Jaehrlich         => _.plusYears(1)
      case Interval.Manuell           => identity // unreachable
    }
    var start = start0
    while (start.isBefore(now)) start = step(start)
    start
  }

  // ---- Manuell calendar path (`GetNextExecutionDate`, Scheduler.cs:1166+)

  private val MaxDateTime = LocalDateTime.MAX

  private def nextManuell(s: Schedule, now: LocalDateTime): LocalDateTime = {
    s.endedatum.foreach { end =>
      if (end.isBefore(now))
        throw new ScheduleException(s"Workflow has no execution left (Endedatum $end < $now)")
    }

    val weekdays = allowedWeekdays(s)
    val months = allowedMonths(s)

    val lastOfMonth = lastOfMonthCandidate(s, now, months, weekdays)

    // minutes between executions (`CalculateTimeBetweenExecutions`, 1915-1932)
    val tbe =
      if (s.tageswiederholung > 0) 24 * 60 / s.tageswiederholung
      else if (s.wochenwiederholung > 0) weekdays.size * 24 * 60 / s.wochenwiederholung
      else 24 * 60
    if (tbe <= 0)
      throw new ScheduleException(
        s"repetition count too high for one execution per minute (tbe=$tbe)")

    val weekRepMapping: Seq[(DayOfWeek, LocalTime)] =
      if (s.tageswiederholung == 0 && s.wochenwiederholung > 0)
        weekRepetitionMapping(s.anfangsdatum, s.wochenwiederholung, tbe, weekdaysOrdered(s))
      else Seq.empty

    val (nextExecYear, nextExecMonth) = nextYearMonth(now, months)

    val candidate =
      if (s.wocheDesMonats > 0)
        firstDateOfExecutionInWeek(s, now, months, weekdays, nextExecYear, nextExecMonth)
      else
        nextTheoreticalStart(s, now, nextExecYear, nextExecMonth, weekRepMapping, months, weekdays, tbe)

    if (lastOfMonth.isBefore(candidate)) lastOfMonth else candidate
  }

  /** `ExtractTimesToExecuteOn` (`Scheduler.cs:1096-1164`): full set when
    * the every-flag is on, else the mask — an empty mask is an error.
    */
  private def allowedWeekdays(s: Schedule): Set[DayOfWeek] =
    if (s.anJedemTag) DayOfWeek.values.toSet
    else if (s.wochentage.nonEmpty) s.wochentage
    else throw new ScheduleException("no weekdays for execution were given")

  private def allowedMonths(s: Schedule): Set[Month] =
    if (s.inJedemMonat) Month.values.toSet
    else if (s.monate.nonEmpty) s.monate
    else throw new ScheduleException("no months for execution were given")

  /** Week-repetition mapping needs the weekdays in Monday-first order, as
    * the reference's fixed `weekdaysFull` list keeps them (`1034-1036`).
    */
  private def weekdaysOrdered(s: Schedule): IndexedSeq[DayOfWeek] =
    DayOfWeek.values.toIndexedSeq.filter(allowedWeekdays(s))

  /** `GetLastOfMonth` (`Scheduler.cs:1785-1829`): step whole months from
    * `now` until the last day of the month lands on an allowed month and
    * weekday; the candidate carries Anfangsdatum's time-of-day. Never
    * compared against `now` — reference quirk preserved.
    */
  private def lastOfMonthCandidate(
      s: Schedule, now: LocalDateTime,
      months: Set[Month], weekdays: Set[DayOfWeek]): LocalDateTime = {
    if (!s.monatsletzter) return MaxDateTime
    var cursor = now
    var last: LocalDate = null
    do {
      last = YearMonth.of(cursor.getYear, cursor.getMonth).atEndOfMonth()
      cursor = cursor.plusMonths(1)
    } while (!months.contains(last.getMonth) || !weekdays.contains(last.getDayOfWeek))
    last.atTime(s.anfangsdatum.toLocalTime)
  }

  /** `GetWeekRepetitionMapping` (`Scheduler.cs:1535-1599`): lay
    * `weekRepetition` execution times across the allowed weekdays,
    * stepping `tbe` minutes; a wrap past midnight (or a >=1-day gap)
    * advances the weekday cursor.
    */
  private def weekRepetitionMapping(
      anfangsdatum: LocalDateTime, weekRepetition: Int, tbe: Int,
      weekdays: IndexedSeq[DayOfWeek]): Seq[(DayOfWeek, LocalTime)] = {
    var start = anfangsdatum.toLocalTime
    var day = 0
    (0 until weekRepetition).map { _ =>
      val entry = (weekdays(day % weekdays.size), start)
      val next = start.plusMinutes(tbe.toLong)
      if (tbe >= 24 * 60) day += tbe / 60 / 24
      else if (next.isBefore(start)) day += 1
      start = next
      entry
    }
  }

  /** `GetNextYearMonthToExecute` (`Scheduler.cs:1489-1527`): first allowed
    * month scanning forward from now's month; crossing December bumps the
    * year.
    */
  private def nextYearMonth(now: LocalDateTime, months: Set[Month]): (Int, Month) = {
    var i = now.getMonthValue
    while (true) {
      val m = Month.of((i - 1) % 12 + 1)
      if (months.contains(m)) {
        val year = if (i - 1 >= 12) now.getYear + 1 else now.getYear
        return (year, m)
      }
      i += 1
    }
    throw new IllegalStateException("unreachable: months is non-empty")
  }

  /** `GetNextTheoreticalStart` (`Scheduler.cs:1383-1487`): seed at
    * (nextExecYear, nextExecMonth, day-1-or-today, Startzeit); with week
    * repetition snap to the mapping's weekday+time; then step `tbe`
    * minutes until the instant is >= now on an allowed weekday and month.
    */
  private def nextTheoreticalStart(
      s: Schedule, now: LocalDateTime, nextExecYear: Int, nextExecMonth: Month,
      weekRepMapping: Seq[(DayOfWeek, LocalTime)],
      months: Set[Month], weekdays: Set[DayOfWeek], tbe: Int): LocalDateTime = {
    val day = if (nextExecMonth.getValue > now.getMonthValue) 1 else now.getDayOfMonth
    var t = LocalDate.of(nextExecYear, nextExecMonth, day).atTime(s.startzeit)
    if (s.wochenwiederholung > 0 && s.tageswiederholung == 0 && weekRepMapping.nonEmpty) {
      while (!weekRepMapping.exists(_._1 == t.getDayOfWeek)) t = t.plusDays(1)
      val mapped = weekRepMapping.find(_._1 == t.getDayOfWeek).get._2
      t = t.toLocalDate.atTime(mapped)
    }
    while (t.isBefore(now) || !weekdays.contains(t.getDayOfWeek) ||
      !months.contains(t.getMonth)) {
      t = t.plusMinutes(tbe.toLong)
    }
    t
  }

  /** `GetWeekDates` (`Scheduler.cs:1842-1913`): the 7 dates of the n-th
    * Monday-aligned week overlapping the month; throws past-month-end
    * (except the December→January overflow the reference misses).
    */
  private[schedule] def weekDates(year: Int, month: Month, week: Int): Seq[LocalDate] = {
    if (week > 5)
      throw new ScheduleException(s"Weeknumber greater 5 is not allowed! (was $week)")
    val firstOfMonth = LocalDate.of(year, month, 1)
    val timeDiff = firstOfMonth.getDayOfWeek.getValue - DayOfWeek.MONDAY.getValue
    val dayOffset = -(if (timeDiff < 0) timeDiff + 7 else timeDiff)
    val firstDayOfWeek = firstOfMonth.plusDays(dayOffset.toLong + 7L * (week - 1))
    if (firstDayOfWeek.getMonthValue > month.getValue)
      throw new ScheduleException(s"Given week does not belong to input date month! ($firstDayOfWeek)")
    (0 until 7).map(i => firstDayOfWeek.plusDays(i.toLong))
  }

  /** `GetFirstDateofExecutionInWeek` + `GetNextFirstDateInWeek`
    * (`Scheduler.cs:1601-1759`): first date >= now in the n-th week of the
    * next allowed month whose weekday is allowed, carrying Anfangsdatum's
    * time-of-day; months advance (with December wrapping the year) until
    * found.
    */
  private def firstDateOfExecutionInWeek(
      s: Schedule, now: LocalDateTime,
      months: Set[Month], weekdays: Set[DayOfWeek],
      nextExecYear0: Int, nextExecMonth0: Month): LocalDateTime = {
    var year = nextExecYear0
    var month = nextExecMonth0
    // Bounded: within 12 iterations an allowed month recurs; weekDates can
    // still throw for week-5-of-a-short-month exactly like the reference.
    var guard = 0
    while (guard < 48) {
      guard += 1
      if (months.contains(month)) {
        // the reference compares the BARE MIDNIGHT date against now and
        // only then adds Anfangsdatum's time-of-day to the accepted
        // candidate (`Scheduler.cs:1646` then `1653`) — comparing the
        // time-augmented candidate accepted "today at 22:00" where the
        // reference skips to the next allowed day, firing a day early
        // whenever Anfangsdatum's time-of-day is after now's (r10 review)
        val candidate = weekDates(year, month, s.wocheDesMonats).collectFirst {
          case d if !d.atStartOfDay.isBefore(now) &&
            months.contains(d.getMonth) && weekdays.contains(d.getDayOfWeek) =>
            d.atTime(s.anfangsdatum.toLocalTime)
        }
        candidate match {
          case Some(c) => return c
          case None    => ()
        }
      }
      if (month.getValue >= 12) year += 1
      month = Month.of(month.getValue % 12 + 1)
    }
    throw new ScheduleException(
      s"no week-of-month execution date found within 4 years (week ${s.wocheDesMonats})")
  }
}
