package graft.steps

import org.scalatest.funsuite.AnyFunSuite

import graft.model.RunLevel
import graft.queries.EndToEnd
import graft.testkit.SparkSupport

/** Ledger semantics of the q106 near-dup workflow (r13, VERDICT next
  * #3) — the signal → prune chain as PIPELINE steps: run rows close at
  * every level, `ErwarteteDaten` carries each step's written row
  * count, the prune step really reads the label step's WAREHOUSE table
  * (stage chaining), and the induced-failure variant takes the
  * fallback-compensation path. The manifest VALUES are the q106 DuckDB
  * oracle's job; this spec owns what SQL can't see.
  */
class NearDupWorkflowSpec extends AnyFunSuite with SparkSupport {

  private val sf = "/root/testdata/sf0.001"

  test("happy path: both stages close green, ErwarteteDaten matches, prune chains off the label table") {
    val (result, ledger, wh) = EndToEnd.runNeardupWorkflow(spark, sf)
    assert(result.success && !result.fallbackRan && result.error.isEmpty)

    val rows = ledger.current
    def level(l: String) = rows.filter(_.level == l)
    assert(level(RunLevel.Workflow).map(r => (r.istAbgeschlossen, r.erfolgreich)) == Seq((true, true)))
    assert(level(RunLevel.Paket).map(_.refId).sorted == Seq(41L, 42L, 43L))
    assert(level(RunLevel.Schritt).map(_.refId).sorted == Seq(4100L, 4200L, 4300L))
    assert(level(RunLevel.Schritt).forall(r => r.istAbgeschlossen && r.erfolgreich))

    // row accounting: the label table covers the whole corpus, the
    // manifest one row per surviving representative
    val nDocs = graft.catalog.Tables.load(spark, sf, "documents").count()
    assert(wh.read(spark, "nd_labels").count() == nDocs,
      "every doc must receive a cluster label (singletons label themselves)")
    def step(ref: Long) = level(RunLevel.Schritt).find(_.refId == ref).get
    assert(step(4200L).erwarteteDaten.contains(nDocs))
    assert(step(4300L).erwarteteDaten.contains(wh.read(spark, "nd_manifest").count()))

    // stage chaining is real: the prune consumed the WAREHOUSE label
    // table (labels resolve warehouse-first), and the manifest is
    // consistent with it — member counts add back up to the corpus
    val memberSum = wh.read(spark, "nd_manifest")
      .agg(org.apache.spark.sql.functions.sum("n_members")).head.getLong(0)
    assert(memberSum == nDocs, "cluster members must partition the corpus")

    // both PIPELINE commands land in the query log, expanded
    val queries = ledger.allQueries.map(_.sql)
    assert(queries.exists(_.startsWith("neardup_components ")))
    assert(queries.exists(q => q.startsWith("neardup_prune ") && q.contains("labels=nd_labels")))

    // the components ALGORITHM dispatch is message-logged (r14, VERDICT
    // r13 next #6: auto is the production default, and a workflow run
    // must record which algorithm labeled it). The LSH collision graph
    // is near-clique, so the probe converges and propagation wins.
    val msgs = ledger.allMessages.map(_.meldungstext)
    assert(msgs.exists(_ == "neardup_components dispatch: propagation"),
      s"auto dispatch must be message-logged; messages: ${msgs.mkString("; ")}")
  }

  test("incremental admission as steps: neardup_signatures builds the historic table, neardup_admit chains off it") {
    val wh = new graft.catalog.Warehouse(graft.util.TempDirs.scratch("nd-admit"))
    val ledger = new graft.ledger.RunLedger()
    val ctx = StepContext(spark, wh, ledger, graft.macros.Macros.Context(1L,
      java.time.LocalDateTime.of(2026, 1, 1, 0, 0),
      java.time.LocalDateTime.of(2026, 1, 2, 0, 0)))
    graft.catalog.Tables.registerAll(spark, sf)
    spark.sql("CREATE OR REPLACE TEMP VIEW nd_hist_src AS " +
      "SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0")
    spark.sql("CREATE OR REPLACE TEMP VIEW nd_batch_src AS " +
      "SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0")
    Steps.execute(StepSpec(9100, CommandType.Copy, TaskType.Pipeline,
      "neardup_signatures in=nd_hist_src", zieltabelle = Some("nd_hist_sig")), ctx)
    val admitted = Steps.execute(StepSpec(9110, CommandType.Copy, TaskType.Pipeline,
      "neardup_admit in=nd_batch_src hist=nd_hist_sig",
      zieltabelle = Some("nd_admitted"), quelltabelle = Some("nd_hist_sig")), ctx).get
    val batchN = spark.table("nd_batch_src").count()
    assert(admitted > 0 && admitted <= batchN,
      s"admitted $admitted of $batchN batch docs")
    // the step really consumed the WAREHOUSE signature table, and the
    // admitted set equals the operator run directly on the same split
    val direct = graft.operators.NearDup.admitAgainst(
      spark.table("nd_batch_src"),
      wh.read(spark, "nd_hist_sig")).count()
    assert(wh.read(spark, "nd_admitted").count() == direct)
    spark.catalog.clearCache()
  }

  test("induced failure: prune against a missing label table aborts, fallback compensates") {
    val (result, ledger, _) = EndToEnd.runNeardupWorkflow(spark, sf, induceFailure = true)
    assert(!result.success && result.fallbackRan && result.error.isDefined)
    val rows = ledger.current
    def step(ref: Long) = rows.find(r => r.level == RunLevel.Schritt && r.refId == ref).get
    assert(step(4200L).erfolgreich, "the label stage completed before the failure")
    assert(step(4300L).istAbgeschlossen && !step(4300L).erfolgreich)
    assert(ledger.allErrors.exists(e => e.meldungstext.contains("step 4300 failed")),
      "the root-cause step must log an error row")
    assert(step(4900L).istAbgeschlossen && step(4900L).erfolgreich,
      "the compensation step must execute after the failure")
    assert(rows.filter(_.level == RunLevel.Workflow)
      .forall(r => r.istAbgeschlossen && !r.erfolgreich))
  }
}
