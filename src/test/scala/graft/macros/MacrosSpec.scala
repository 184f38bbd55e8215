package graft.macros

import java.time.LocalDateTime

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.testkit.PropSupport

class MacrosSpec extends AnyFunSuite with PropSupport {

  private val ctx = Macros.Context(
    workflowId = 42L,
    takeoverVon = LocalDateTime.of(2024, 1, 5, 0, 0),
    takeoverBis = LocalDateTime.of(2024, 2, 4, 23, 59, 59),
    belegungszeit = Some(LocalDateTime.of(2024, 1, 5, 8, 30, 15)),
    prozesslaeufeId = Some(7L),
    zeitplanAusfuehrungenId = Some(9L),
    etlProzesslaeufeId = Some(1L),
    etlPaketProzesslaeufeId = Some(2L),
    etlPaketumsetzungProzesslaeufeId = Some(3L),
    etlPaketschrittProzesslaeufeId = Some(4L),
    debug = true)

  test("takeover dates expand as yyyyMMdd (CommandExecuter.cs:153-154 format)") {
    assert(Macros.expand("WHERE d BETWEEN ##Uebernahme_von## AND ##Uebernahme_bis##", ctx) ==
      "WHERE d BETWEEN 20240105 AND 20240204")
  }

  test("id placeholders expand to bare numbers; Belegungszeit is a quoted SQL timestamp") {
    assert(Macros.expand("##Workflow_ID##|##Prozesslaeufe_ID##|##Zeitplan_ID##", ctx) == "42|7|9")
    assert(Macros.expand(
      "##ETL_Prozesslaeufe_ID##,##ETL_Paket_Prozesslaeufe_ID##," +
        "##ETL_Paketumsetzung_Prozesslaeufe_ID##,##ETL_Paketschritt_Prozesslaeufe_ID##",
      ctx) == "1,2,3,4")
    assert(Macros.expand("SELECT ##Belegungszeit##", ctx) == "SELECT '2024-01-05 08:30:15'")
    assert(Macros.expand("##Debug##", ctx) == "True")
  }

  test("whitespace inside the markers is tolerated (reference regex allows it)") {
    assert(Macros.expand("## Workflow_ID ##", ctx) == "42")
  }

  test("unknown placeholder throws NYI-style error (Helper.cs:3218-3224)") {
    assertThrows[Macros.UnknownPlaceholderException] {
      Macros.expand("SELECT ##Not_A_Thing##", ctx)
    }
  }

  test("referencing an unavailable optional value fails fast") {
    assertThrows[IllegalArgumentException] {
      Macros.expand("##Prozesslaeufe_ID##", ctx.copy(prozesslaeufeId = None))
    }
  }

  test("strings without placeholders pass through unchanged") {
    val plain = Gen.asciiPrintableStr.map(_.replace("#", ""))
    forAllSamples(plain) { s => assert(Macros.expand(s, ctx) == s) }
  }

  test("expansion leaves no known placeholder behind") {
    val holders = Gen.someOf(Macros.known - "Belegungszeit")
    forAllSamples(holders) { hs =>
      val cmd = hs.map(h => s"x ##$h## y").mkString(" AND ")
      val out = Macros.expand(cmd, ctx)
      assert(!out.contains("##"))
    }
  }
}
