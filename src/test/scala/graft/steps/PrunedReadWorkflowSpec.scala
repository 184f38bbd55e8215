package graft.steps

import org.scalatest.funsuite.AnyFunSuite

import graft.model.RunLevel
import graft.queries.EndToEnd
import graft.testkit.SparkSupport

/** Scheduling semantics of the q116 pruned-read workflow (r14, VERDICT
  * r13 missing #1) — the manifest-planned read reachable from the step
  * surface: the `pruned_read` PIPELINE step really skips manifested
  * files (scheduled < total in the message log), the stale-manifest
  * append's rows still land in the Zieltabelle (freshness rule), and a
  * read against a missing table fails loudly into the fallback path.
  * The row VALUES are the q116 DuckDB oracle's job; this spec owns what
  * SQL can't see.
  */
class PrunedReadWorkflowSpec extends AnyFunSuite with SparkSupport {

  private val sf = "/root/testdata/sf0.001"

  private val MsgRe = """pruned_read on pr_lineitem: scheduled (\d+) of (\d+) files""".r

  test("happy path: manifest prunes files, stale append's rows survive, counts message-logged") {
    val (result, ledger, wh) = EndToEnd.runPrunedReadWorkflow(spark, sf)
    assert(result.success && !result.fallbackRan && result.error.isEmpty)
    val rows = ledger.current
    assert(rows.filter(_.level == RunLevel.Schritt)
      .forall(r => r.istAbgeschlossen && r.erfolgreich))

    // the scheduling evidence: the step message-logs scheduled/total
    // like MAINTENANCE file accounting, and the manifest really pruned
    // (the rectangle covers a small corner of a 2-key quantile layout,
    // so a planner that schedules everything is broken, not unlucky)
    val msgs = ledger.allMessages.map(_.meldungstext)
    val counts = msgs.collectFirst { case MsgRe(s, t) => (s.toInt, t.toInt) }
    assert(counts.isDefined,
      s"pruned_read must message-log its file accounting; messages: ${msgs.mkString("; ")}")
    val (scheduled, total) = counts.get
    assert(scheduled < total,
      s"the manifest must prune at least one file ($scheduled of $total scheduled)")
    assert(scheduled >= 1, "the rectangle holds rows, so some file must be scheduled")

    // freshness at the step surface: the third COPY slice landed AFTER
    // refresh_stats, so its files are unmanifested — they must be
    // scanned, and their qualifying rows must appear in the Zieltabelle
    import org.apache.spark.sql.functions.col
    val li = graft.catalog.Tables.load(spark, sf, "lineitem")
    val rect = col("l_partkey").between(10, 59) && col("l_suppkey").between(3, 20)
    def sliceCount(from: String, to: String): Long =
      li.filter(col("l_shipdate") >= from && col("l_shipdate") < to)
        .filter(rect).count()
    val staleRows = sliceCount("1995-07-01", "1995-10-01")
    assert(staleRows > 0, "fixture must put rectangle rows into the stale slice")
    val expected = sliceCount("1995-01-01", "1995-10-01")
    assert(wh.read(spark, "pr_slice").count() == expected,
      "the pruned read must return exactly the rectangle over all three slices")

    // the expanded PIPELINE command lands in the query log
    assert(ledger.allQueries.map(_.sql).exists(q =>
      q.startsWith("pruned_read ") && q.contains("in=pr_lineitem")))
  }

  test("induced failure: pruned_read against a missing table aborts loudly, fallback compensates") {
    val (result, ledger, _) = EndToEnd.runPrunedReadWorkflow(spark, sf, induceFailure = true)
    assert(!result.success && result.fallbackRan && result.error.isDefined)
    assert(result.error.get.getMessage.contains("not a warehouse table"),
      s"the failure must name the contract, got: ${result.error.get.getMessage}")
    val rows = ledger.current
    def step(ref: Long) = rows.find(r => r.level == RunLevel.Schritt && r.refId == ref).get
    assert(step(9300L).erfolgreich, "the stale append completed before the failure")
    assert(step(9310L).istAbgeschlossen && !step(9310L).erfolgreich)
    assert(step(9900L).istAbgeschlossen && step(9900L).erfolgreich,
      "the compensation step must execute after the failure")
  }
}
