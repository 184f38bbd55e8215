package graft.steps

import java.time.LocalDateTime

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.testkit.PropSupport

/** The Zeitscheibe boundary math SURVEY §7.5 flags as off-by-one
  * sensitive, property-tested against the loop semantics of
  * `CommandExecuter.cs:143-261`.
  */
class MonthWindowsSpec extends AnyFunSuite with PropSupport {

  private val genRange: Gen[(LocalDateTime, LocalDateTime)] = for {
    y <- Gen.choose(2020, 2027)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    spanDays <- Gen.choose(0L, 800L)
  } yield {
    val from = LocalDateTime.of(y, m, d, 0, 0, 0)
    (from, from.plusDays(spanDays).toLocalDate.atTime(23, 59, 59))
  }

  test("windows are contiguous day-wise: next from = previous to's date + 1 day") {
    forAllSamples(genRange) { case (from, to) =>
      val ws = MonthWindows.windows(from, to)
      ws.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.from.toLocalDate == a.to.toLocalDate.plusDays(1))
        case _ => ()
      }
    }
  }

  test("every window spans at most one month and times are day-aligned") {
    forAllSamples(genRange) { case (from, to) =>
      MonthWindows.windows(from, to).foreach { w =>
        assert(w.from.toLocalTime == java.time.LocalTime.MIDNIGHT)
        assert(w.to.toLocalTime == java.time.LocalTime.of(23, 59, 59))
        assert(!w.to.isAfter(w.from.plusMonths(1).minusDays(1).toLocalDate.atTime(23, 59, 59)))
      }
    }
  }

  test("coverage: first window starts at takeover-from; last ends at takeover-to, except the single-window quirk") {
    forAllSamples(genRange) { case (from, to) =>
      val ws = MonthWindows.windows(from, to)
      assert(ws.head.from.toLocalDate == from.toLocalDate)
      if (ws.size > 1)
        assert(ws.last.to.toLocalDate == to.toLocalDate)
      else
        // reference quirk: the first slice is emitted before any clamp, so a
        // sub-month takeover window still gets a full month slice
        assert(ws.head.to.toLocalDate == from.plusMonths(1).minusDays(1).toLocalDate)
    }
  }

  test("example from SURVEY: [2024-01-15, 2024-03-20] slices") {
    val ws = MonthWindows.windows(
      LocalDateTime.of(2024, 1, 15, 0, 0), LocalDateTime.of(2024, 3, 20, 23, 59, 59))
    assert(ws.map(w => (w.from.toLocalDate.toString, w.to.toLocalDate.toString)) == Seq(
      ("2024-01-15", "2024-02-14"),
      ("2024-02-15", "2024-03-14"),
      ("2024-03-15", "2024-03-20")))
  }

  test("day-31 anchored windows clamp like .NET AddMonths and stay contiguous") {
    val ws = MonthWindows.windows(
      LocalDateTime.of(2024, 1, 31, 0, 0), LocalDateTime.of(2024, 5, 15, 23, 59, 59))
    // Jan 31 + 1M clamps to Feb 29 (leap), -1d → Feb 28; next from Feb 29
    assert(ws.head.from.toLocalDate == java.time.LocalDate.of(2024, 1, 31))
    assert(ws.head.to.toLocalDate == java.time.LocalDate.of(2024, 2, 28))
    assert(ws(1).from.toLocalDate == java.time.LocalDate.of(2024, 2, 29))
    ws.sliding(2).foreach {
      case Seq(a, b) => assert(b.from.toLocalDate == a.to.toLocalDate.plusDays(1))
      case _ => ()
    }
    assert(ws.last.to.toLocalDate == java.time.LocalDate.of(2024, 5, 15))
  }

  test("predicates render BETWEEN bounds with second precision (incl. the trailing empty-slice quirk)") {
    val ps = MonthWindows.predicates("l_shipdate",
      LocalDateTime.of(2024, 1, 1, 0, 0), LocalDateTime.of(2024, 1, 31, 23, 59, 59))
    // The reference's equality-based termination (CommandExecuter.cs:245)
    // misses a to-the-second-aligned month end (Jan 31 00:00 != Jan 31
    // 23:59:59), so a degenerate second slice (from > to, matches nothing)
    // is emitted before the clamp triggers the break — preserved. The
    // REAL final slice therefore sits at an interior index, and its bound
    // must NOT take the `.999999` extension: the cap at the overall
    // takeover end keeps the slice union identical to the fused
    // `[from, takeoverBis]` range (ADVICE r7 — an uncapped extension
    // ingested fractional-second rows past the requested range).
    assert(ps == Seq(
      "l_shipdate BETWEEN '2024-01-01 00:00:00' AND '2024-01-31 23:59:59'",
      "l_shipdate BETWEEN '2024-02-01 00:00:00' AND '2024-01-31 23:59:59'"))
  }

  test("predicates cover the takeover range contiguously: a fractional-second row falls in exactly one partition") {
    val ps = MonthWindows.predicates("ts",
      LocalDateTime.of(2024, 1, 1, 0, 0), LocalDateTime.of(2024, 3, 31, 23, 59, 59))
    // interior slices extend to .999999; the row '2024-01-31 23:59:59.5'
    // (the reference's serial loop would drop it) matches slice 1 only
    assert(ps.head.endsWith("'2024-01-31 23:59:59.999999'"))
    // the trailing degenerate window (Apr 1 > Mar 31) demotes the REAL
    // final slice (Mar) to an interior index, where the cap at the
    // overall takeover end suppresses its extension — so exactly the
    // slices BEFORE the real final one carry `.999999` (ADVICE r7)
    assert(ps.size == 4)
    val boundaries = ps.count(_.contains(".999999"))
    assert(boundaries == ps.size - 2,
      "every interior slice except the capped real-final one must carry the extension")
    assert(ps(2).endsWith("'2024-03-31 23:59:59'"), s"capped real-final slice: ${ps(2)}")
  }

  test("no predicate bound ever exceeds the takeover end (ADVICE r7 over-coverage property)") {
    // Property form of the cap: for ANY takeover range, parse every
    // rendered upper bound back and require it <= takeoverBis at
    // microsecond precision. Before the cap, month-aligned ends rendered
    // '…23:59:59.999999' on the real final slice and violated this.
    val fmtS = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val fmtF = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    forAllSamples(genRange) { case (from, to) =>
      MonthWindows.predicates("ts", from, to).foreach { p =>
        val upper = p.substring(p.lastIndexOf("AND '") + 5, p.length - 1)
        val parsed =
          if (upper.contains(".")) LocalDateTime.parse(upper, fmtF)
          else LocalDateTime.parse(upper, fmtS)
        assert(!parsed.isAfter(to), s"bound $upper exceeds takeover end $to in: $p")
      }
    }
  }
}
