package graft.steps

import java.time.{LocalDateTime, LocalTime}

/** `Zeitscheibe` month-window calculus — the slice loop of the
  * reference's timesliced copy (`/root/reference/code/DIZService.Core/
  * CommandExecuter.cs:143-261`): windows are `[from 00:00:00,
  * (from+1M-1d) 23:59:59]`, the next `from` is the previous end + 1 day,
  * and the end is clamped to the takeover end *from the second slice on*
  * (the first slice is emitted unclamped — reference quirk preserved;
  * `nextMonth` is computed at `CommandExecuter.cs:143` before the clamp
  * at `256-260` ever runs).
  *
  * Pure calculus; the engine turns the windows into predicate filters —
  * a partition-pruned parallel read instead of the reference's serial
  * per-slice loop (SURVEY §2.1 S2).
  */
object MonthWindows {

  final case class Window(from: LocalDateTime, to: LocalDateTime)

  private val DayEnd = LocalTime.of(23, 59, 59)

  /** All slice windows for takeover `[executeFrom, executeTo]`. Mirrors
    * the loop's observable boundaries: slice dates come from the running
    * date cursor, times are pinned to 00:00:00 / 23:59:59 exactly like
    * the `yyyyMMdd000000` / `yyyyMMdd235959` formats.
    */
  def windows(executeFrom: LocalDateTime, executeTo: LocalDateTime): Seq[Window] = {
    val out = Seq.newBuilder[Window]
    var from = executeFrom
    var nextMonth = executeFrom.plusMonths(1).minusDays(1)
    var done = false
    while (!done) {
      out += Window(
        from.toLocalDate.atStartOfDay(),
        nextMonth.toLocalDate.atTime(DayEnd))
      if (nextMonth.isEqual(executeTo)) done = true
      else {
        from = nextMonth.plusDays(1)
        nextMonth = from.plusMonths(1).minusDays(1)
        if (nextMonth.isAfter(executeTo)) nextMonth = executeTo
      }
    }
    out.result()
  }

  /** The windows as SQL BETWEEN predicates over `col`, ready for a JDBC
    * `predicates` array (each predicate becomes one input partition —
    * the parallel re-expression of the reference's serial loop).
    * Interior upper bounds extend to `.999999` so the partitions cover
    * the takeover range contiguously at microsecond precision — a
    * fractional-second row in a `(23:59:59, 24:00:00)` gap lands in
    * exactly one partition instead of none (the half-open normalization
    * shared with `Steps.timeslicedSource`). The extension is CAPPED at
    * the overall takeover end: a month-aligned takeover ends with a
    * degenerate last window (the preserved reference quirk above), so the
    * real final slice sits at an interior index and an uncapped
    * `.999999` would cover rows past the requested range (ADVICE r7).
    */
  def predicates(col: String, executeFrom: LocalDateTime, executeTo: LocalDateTime): Seq[String] = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val ws = windows(executeFrom, executeTo)
    val overallTo = ws.last.to
    ws.zipWithIndex.map { case (w, i) =>
      val to =
        if (i == ws.size - 1) w.to.format(fmt)
        else if (w.to.plusNanos(999999000L).isAfter(overallTo)) overallTo.format(fmt)
        else w.to.format(fmt) + ".999999"
      s"$col BETWEEN '${w.from.format(fmt)}' AND '$to'"
    }
  }
}
