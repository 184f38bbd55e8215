package graft.steps

import org.scalatest.funsuite.AnyFunSuite

import graft.model.RunLevel
import graft.queries.EndToEnd
import graft.testkit.SparkSupport

/** Ledger semantics of the q103 curation workflow — the assertions the
  * DuckDB oracle can't express (ServiceSpec-style): every level's run
  * rows close correctly, `ErwarteteDaten` carries each PIPELINE step's
  * written row count, the macro-expanded stage commands land in the
  * query log, and the induced-failure variant takes the cancellation
  * cascade + fallback-compensation path with the right error/abort
  * accounting.
  */
class CurationWorkflowSpec extends AnyFunSuite with SparkSupport {

  private val sf = "/root/testdata/sf0.001"

  test("happy path: all four levels close successfully and ErwarteteDaten matches the written tables") {
    val (result, ledger, wh) = EndToEnd.runCurationWorkflow(spark, sf)
    assert(result.success && !result.fallbackRan && result.error.isEmpty)

    val rows = ledger.current
    def level(l: String) = rows.filter(_.level == l)
    assert(level(RunLevel.Workflow).map(r => (r.istAbgeschlossen, r.erfolgreich)) == Seq((true, true)))
    assert(level(RunLevel.Paket).map(_.refId).sorted == Seq(31L, 32L, 33L))
    assert(level(RunLevel.Paket).forall(r => r.istAbgeschlossen && r.erfolgreich))
    assert(level(RunLevel.Umsetzung).map(_.refId).sorted == Seq(310L, 320L, 330L))
    assert(level(RunLevel.Schritt).map(_.refId).sorted ==
      Seq(3100L, 3200L, 3201L, 3300L, 3301L))
    assert(level(RunLevel.Schritt).forall(r => r.istAbgeschlossen && r.erfolgreich))

    // each PIPELINE step's ErwarteteDaten = the rows its table holds;
    // the SQL_TARGET view step moves no rows and records none
    val written = Map(3200L -> "cur_clean", 3201L -> "cur_keep",
      3300L -> "cur_cleaned", 3301L -> "cur_manifest")
    written.foreach { case (stepRef, table) =>
      val row = level(RunLevel.Schritt).find(_.refId == stepRef).get
      assert(row.erwarteteDaten.contains(wh.read(spark, table).count()),
        s"step $stepRef must account the rows it wrote to $table")
    }
    assert(level(RunLevel.Schritt).find(_.refId == 3100L).get.erwarteteDaten.isEmpty)
    assert(wh.read(spark, "cur_manifest").count() > 0, "the sliced corpus must yield a manifest")

    // macros really fed the stage parameters: the logged (expanded)
    // commands carry the workflow-id holdout and the takeover-day slice
    val queries = ledger.allQueries.map(_.sql)
    assert(queries.exists(q => q.startsWith("decontaminate ") && q.endsWith("holdout=7")),
      s"##Workflow_ID## must expand into the holdout parameter:\n${queries.mkString("\n")}")
    assert(queries.exists(_.contains("BETWEEN 19960301 % 100 AND 19960328 % 100")),
      "the takeover window must expand into the corpus-slice predicate")
  }

  test("PIPELINE command parsing fails loudly: unknown transform, malformed pair, missing parameter") {
    val ctx = StepContext(spark,
      new graft.catalog.Warehouse(graft.util.TempDirs.scratch("tf-parse")),
      new graft.ledger.RunLedger(),
      graft.macros.Macros.Context(1L,
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0),
        java.time.LocalDateTime.of(2026, 1, 2, 0, 0)))
    val unknown = intercept[IllegalArgumentException](Transforms.resolve("nonsense in=x", ctx))
    assert(unknown.getMessage.contains("unknown PIPELINE transform"))
    assert(unknown.getMessage.contains("span_removal"), "the error must list what IS registered")
    val malformed = intercept[IllegalArgumentException](
      Transforms.resolve("decontaminate justakey", ctx))
    assert(malformed.getMessage.contains("not key=value"))
    val missing = intercept[IllegalArgumentException](
      Transforms.resolve("decontaminate holdout=7", ctx))
    assert(missing.getMessage.contains("'in'"))
    // Zeitscheibe has no PIPELINE semantics — rejected loudly, not
    // silently ignored (every other COPY month-slices the takeover)
    val sliced = intercept[IllegalArgumentException](Steps.execute(
      StepSpec(5001, CommandType.Copy, TaskType.Pipeline,
        "repetition in=documents", zieltabelle = Some("x"), zeitscheibe = true), ctx))
    assert(sliced.getMessage.contains("Zeitscheibe"))
  }

  test("dsir_weight runs as a PIPELINE step and matches the operator run directly") {
    // the registry is not curation-only: the DSIR scorer executes under
    // the same step lifecycle (macro expansion, audit columns,
    // ErwarteteDaten) and its table equals the operator's own output
    import org.apache.spark.sql.functions.col
    graft.catalog.Tables.registerAll(spark, sf)
    val wh = new graft.catalog.Warehouse(graft.util.TempDirs.scratch("dsir-step"))
    val ledger = new graft.ledger.RunLedger()
    val ctx = StepContext(spark, wh, ledger,
      graft.macros.Macros.Context(7L,
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0),
        java.time.LocalDateTime.of(2026, 1, 2, 0, 0)))
    val moved = Steps.execute(
      StepSpec(5000, CommandType.Copy, TaskType.Pipeline,
        "dsir_weight in=documents target_lang=en",
        zieltabelle = Some("doc_scores")), ctx)
    val viaStep = wh.read(spark, "doc_scores")
      .select(col("doc_id"), col("n_feats"), col("dsir_weight_mean"), col("dsir_weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val direct = graft.operators.Dsir.weightsManaged(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
      targetPred = col("lang") === "en") {
      _.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    assert(viaStep == direct, "the step lifecycle must not perturb the operator's output")
    assert(moved.contains(direct.size.toLong), "ErwarteteDaten must count the written rows")
  }

  test("dsir_select runs as a PIPELINE step and matches the q108 gate output") {
    // the selector surface too: the top-k SET a workflow step writes is
    // the set the oracle-gated q108 selector returns — ranking on the
    // normalized mean inside the operator, never reconstructable from
    // the raw sum at the step command
    import org.apache.spark.sql.functions.col
    graft.catalog.Tables.registerAll(spark, sf)
    val wh = new graft.catalog.Warehouse(graft.util.TempDirs.scratch("dsir-select-step"))
    val ledger = new graft.ledger.RunLedger()
    val ctx = StepContext(spark, wh, ledger,
      graft.macros.Macros.Context(7L,
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0),
        java.time.LocalDateTime.of(2026, 1, 2, 0, 0)))
    val moved = Steps.execute(
      StepSpec(5007, CommandType.Copy, TaskType.Pipeline,
        "dsir_select in=documents target_lang=en k=50",
        zieltabelle = Some("doc_selected")), ctx)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("n_feats"), col("dsir_weight_mean"), col("dsir_weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaStep = key(wh.read(spark, "doc_selected"))
    val viaGate = key(graft.queries.Registry.byName("q108_dsir_select_topk").run(spark, sf))
    spark.catalog.clearCache()
    assert(viaStep == viaGate, "the step must select exactly the gate's top-k set")
    assert(moved.contains(viaGate.size.toLong), "ErwarteteDaten must count the written rows")
  }

  test("semdedup runs as a PIPELINE step and matches the q91 gate output (r13: the last selection surface step-reachable)") {
    import org.apache.spark.sql.functions.col
    graft.catalog.Tables.registerAll(spark, sf)
    val wh = new graft.catalog.Warehouse(graft.util.TempDirs.scratch("semdedup-step"))
    val ledger = new graft.ledger.RunLedger()
    val ctx = StepContext(spark, wh, ledger,
      graft.macros.Macros.Context(7L,
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0),
        java.time.LocalDateTime.of(2026, 1, 2, 0, 0)))
    val moved = Steps.execute(
      StepSpec(5003, CommandType.Copy, TaskType.Pipeline,
        "semdedup in=embeddings threshold=0.3 seed_k=8",
        zieltabelle = Some("vec_survivors")), ctx)
    val viaStep = wh.read(spark, "vec_survivors")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaGate = graft.queries.Registry.byName("q91_semdedup").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache() // the gate form's persists (registry contract)
    assert(viaStep == viaGate, "the step lifecycle must not perturb the operator's output")
    assert(moved.contains(viaGate.size.toLong))
  }

  test("paragraph_dedup and bloom_ingest run as PIPELINE steps and match their gate outputs") {
    // the no-drift rule for the rest of the r13 dedup registry: the
    // step lifecycle must write exactly what the oracle-gated bodies
    // compute (q87's dedup; q89's bloom-pre-filtered admission)
    import org.apache.spark.sql.functions.col
    graft.catalog.Tables.registerAll(spark, sf)
    val wh = new graft.catalog.Warehouse(graft.util.TempDirs.scratch("dedup-steps"))
    val ledger = new graft.ledger.RunLedger()
    val ctx = StepContext(spark, wh, ledger,
      graft.macros.Macros.Context(7L,
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0),
        java.time.LocalDateTime.of(2026, 1, 2, 0, 0)))

    Steps.execute(StepSpec(5004, CommandType.Copy, TaskType.Pipeline,
      "paragraph_dedup in=documents chunk=20",
      zieltabelle = Some("para_dedup")), ctx)
    val viaStep = wh.read(spark, "para_dedup")
      .select(col("doc_id"), col("chunks_kept"), col("tokens_kept"), col("cleaned_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val viaGate = graft.queries.Registry.byName("q87_paragraph_dedup").run(spark, sf)
      .select(col("doc_id"), col("chunks_kept"), col("tokens_kept"), col("cleaned_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    spark.catalog.clearCache()
    assert(viaStep == viaGate)

    // bloom_ingest: seed the seen table as a previous step would, then
    // admit the incoming slice; equals the q89 gate rows
    spark.sql("""CREATE OR REPLACE TEMP VIEW bl_fp_step AS
      SELECT doc_id, md5(concat_ws(' ', split(trim(lower(text)), '\\s+'))) AS fingerprint
      FROM documents""")
    Steps.execute(StepSpec(5005, CommandType.Copy, TaskType.Sql,
      "SELECT fingerprint FROM bl_fp_step WHERE pmod(doc_id, 4) != 0",
      zieltabelle = Some("bl_seen_step")), ctx)
    spark.sql("CREATE OR REPLACE TEMP VIEW bl_incoming AS " +
      "SELECT doc_id, fingerprint FROM bl_fp_step WHERE pmod(doc_id, 4) = 0")
    Steps.execute(StepSpec(5006, CommandType.Copy, TaskType.Pipeline,
      "bloom_ingest in=bl_incoming seen=bl_seen_step key=fingerprint mbits=65536 k=5",
      zieltabelle = Some("bl_admitted_step")), ctx)
    val admittedStep = wh.read(spark, "bl_admitted_step")
      .select(col("doc_id"), col("fingerprint"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val admittedGate = graft.queries.Registry.byName("q89_bloom_incremental").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    spark.catalog.clearCache()
    assert(admittedStep == admittedGate)
  }

  test("induced stage failure: cancellation cascade aborts the successor, fallback package compensates") {
    val (result, ledger, _) = EndToEnd.runCurationWorkflow(spark, sf, induceFailure = true)
    assert(!result.success && result.fallbackRan && result.error.isDefined)

    val rows = ledger.current
    def step(ref: Long) = rows.find(r => r.level == RunLevel.Schritt && r.refId == ref).get
    // span removal failed (its clean input table does not exist) …
    assert(step(3300L).istAbgeschlossen && !step(3300L).erfolgreich)
    assert(ledger.allErrors.exists(e => e.meldungstext.contains("step 3300 failed")),
      "the root-cause step must log an error row")
    // … and the queued mixture step never starts: the cancellation
    // cascade's checkpoint fires before the step opens a ledger row, so
    // the aborted successor leaves NO run row and NO error row — the
    // single root-cause error stays unburied (the r10 discipline)
    assert(!rows.exists(r => r.level == RunLevel.Schritt && r.refId == 3301L),
      "a cascade-aborted queued step must not open a run row")
    assert(!ledger.allErrors.exists(_.meldungstext.contains("step 3301")),
      "an aborted successor is not a SQL failure")
    // the fallback package ran to success under the failed workflow run
    assert(step(3900L).istAbgeschlossen && step(3900L).erfolgreich,
      "the compensation step must execute after the failure")
    assert(rows.exists(r => r.level == RunLevel.Paket && r.refId == 39L && r.erfolgreich))
    // the workflow row itself closes unsuccessfully
    assert(rows.filter(_.level == RunLevel.Workflow)
      .forall(r => r.istAbgeschlossen && !r.erfolgreich))
    // stage-2 tables were built before the failure: their steps stay green
    assert(step(3200L).erfolgreich && step(3201L).erfolgreich)
  }
}
