package graft.schedule

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class TakeoverSpec extends AnyFunSuite {

  private val now = LocalDateTime.of(2024, 3, 15, 14, 23, 7)
  private val requested = LocalDateTime.of(2024, 3, 15, 14, 0, 0)

  test("relative mode is day-aligned: today 23:59:59 back n days to 00:00:00 (Workflow.cs:612-619)") {
    val (from, to) = Takeover.window(
      Takeover.Config(uebernahmeTageRueckwirkend = Some(7)), now, requested)
    assert(to == LocalDateTime.of(2024, 3, 15, 23, 59, 59))
    assert(from == LocalDateTime.of(2024, 3, 8, 0, 0, 0))
  }

  test("explicit window passes through") {
    val (from, to) = Takeover.window(
      Takeover.Config(
        uebernahmeVon = Some(LocalDateTime.of(2024, 1, 1, 0, 0)),
        uebernahmeBis = Some(LocalDateTime.of(2024, 2, 1, 0, 0))), now, requested)
    assert(from == LocalDateTime.of(2024, 1, 1, 0, 0))
    assert(to == LocalDateTime.of(2024, 2, 1, 0, 0))
  }

  test("open-ended explicit window falls back to the request time (Workflow.cs:628-640)") {
    val (_, to) = Takeover.window(
      Takeover.Config(uebernahmeVon = Some(LocalDateTime.of(2024, 1, 1, 0, 0))), now, requested)
    assert(to == requested)
  }

  test("neither shape configured is an error (table CHECK constraint)") {
    assertThrows[IllegalArgumentException] {
      Takeover.window(Takeover.Config(), now, requested)
    }
  }
}
