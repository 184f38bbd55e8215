package graft.steps

import org.scalatest.funsuite.AnyFunSuite

import graft.model.RunLevel
import graft.queries.EndToEnd
import graft.testkit.SparkSupport

/** Ledger semantics of the q110 ANN workflow (r13) — train → assign →
  * search as chained PIPELINE steps over warehouse-table index
  * artifacts. The top-k VALUES are q110's DuckDB oracle's job; this
  * spec owns the run accounting, the real stage chain (the search
  * reads the book and assignments back from the WAREHOUSE, not from a
  * session cache), and the induced-failure fallback path.
  */
class AnnWorkflowSpec extends AnyFunSuite with SparkSupport {

  private val sf = "/root/testdata/sf0.001"

  test("happy path: three stages close green, index artifacts are real warehouse tables") {
    val (result, ledger, wh) = EndToEnd.runAnnWorkflow(spark, sf)
    assert(result.success && !result.fallbackRan && result.error.isEmpty)

    val rows = ledger.current
    def level(l: String) = rows.filter(_.level == l)
    assert(level(RunLevel.Paket).map(_.refId).sorted == Seq(71L, 72L, 73L, 74L))
    assert(level(RunLevel.Schritt).map(_.refId).sorted == Seq(7100L, 7200L, 7300L, 7400L))
    assert(level(RunLevel.Schritt).forall(r => r.istAbgeschlossen && r.erfolgreich))

    // row accounting: the book holds at most k=4 non-empty cells, the
    // assignment table covers the whole corpus, the top-k table at most
    // topk rows per query
    val nVecs = graft.catalog.Tables.load(spark, sf, "embeddings").count()
    val bookRows = wh.read(spark, "ann_book").count()
    assert(bookRows >= 1 && bookRows <= 4)
    assert(wh.read(spark, "ann_assign").count() == nVecs,
      "every corpus vector must receive exactly one cell")
    val topk = wh.read(spark, "ann_topk")
    assert(topk.count() <= 30 * 3)
    def step(ref: Long) = level(RunLevel.Schritt).find(_.refId == ref).get
    assert(step(7200L).erwarteteDaten.contains(bookRows))
    assert(step(7300L).erwarteteDaten.contains(nVecs))
    assert(step(7400L).erwarteteDaten.contains(topk.count()))

    // the stage chain is real: the search step's inputs resolve
    // warehouse-first, and its claim set names both index tables
    val spec = EndToEnd.annWorkflowSpec("v")
    val searchStep = spec.packages(74L).realizations.head.steps.head
    assert(StepSpec.claimedTables(searchStep) == Set("ann_topk", "ann_book", "ann_assign"))

    // all three PIPELINE commands land in the query log, expanded
    val queries = ledger.allQueries.map(_.sql)
    assert(queries.exists(_.startsWith("kmeans_train ")))
    assert(queries.exists(_.startsWith("ivf_assign ")))
    assert(queries.exists(q => q.startsWith("ann_search ") && q.contains("assign=ann_assign")))
  }

  test("induced failure: search against a missing assignment table aborts, fallback compensates") {
    val (result, ledger, _) = EndToEnd.runAnnWorkflow(spark, sf, induceFailure = true)
    assert(!result.success && result.fallbackRan && result.error.isDefined)
    val rows = ledger.current
    def stepRow(ref: Long) = rows.find(r => r.level == RunLevel.Schritt && r.refId == ref)
    assert(stepRow(7200L).exists(_.erfolgreich) && stepRow(7300L).exists(_.erfolgreich),
      "the index-build stages completed before the failure")
    assert(stepRow(7400L).exists(r => r.istAbgeschlossen && !r.erfolgreich))
    assert(stepRow(7900L).exists(r => r.istAbgeschlossen && r.erfolgreich),
      "the compensation step must execute after the failure")
    assert(rows.filter(_.level == RunLevel.Workflow)
      .forall(r => r.istAbgeschlossen && !r.erfolgreich))
  }
}
