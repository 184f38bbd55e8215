package graft.steps

import org.scalatest.funsuite.AnyFunSuite

import graft.model.RunLevel
import graft.queries.EndToEnd
import graft.testkit.SparkSupport

/** Ledger semantics of the q107 streaming workflow (r13, VERDICT next
  * #4) — a Structured Streaming query under `WorkflowRunner`: the
  * STREAM step drains to completion with run rows and `ErwarteteDaten`
  * like any batch step, the stream bootstraps its bare state tables
  * from the COPY step's seed (no audit-column leakage into
  * stream-appended tables), and a stream that fails on start takes
  * the cancellation + fallback path. Admission VALUES are the q107
  * DuckDB oracle's job; this spec owns the orchestration contract.
  */
class StreamWorkflowSpec extends AnyFunSuite with SparkSupport {

  private val sf = "/root/testdata/sf0.001"

  test("happy path: COPY seed + STREAM drain close green; ErwarteteDaten = admitted rows") {
    val (result, ledger, wh) = EndToEnd.runStreamWorkflow(spark, sf)
    assert(result.success && !result.fallbackRan && result.error.isEmpty)

    val rows = ledger.current
    def level(l: String) = rows.filter(_.level == l)
    assert(level(RunLevel.Workflow).map(r => (r.istAbgeschlossen, r.erfolgreich)) == Seq((true, true)))
    assert(level(RunLevel.Paket).map(_.refId).sorted == Seq(51L, 52L))
    assert(level(RunLevel.Schritt).map(_.refId).sorted == Seq(5100L, 5200L))
    assert(level(RunLevel.Schritt).forall(r => r.istAbgeschlossen && r.erfolgreich))

    // the STREAM step accounts exactly the rows the drained run admitted
    def step(ref: Long) = level(RunLevel.Schritt).find(_.refId == ref).get
    val admitted = wh.read(spark, "bl_admitted").count()
    assert(admitted > 0)
    assert(step(5200L).erwarteteDaten.contains(admitted))
    // and the COPY seed accounts the historic keyset it wrote
    assert(step(5100L).erwarteteDaten.contains(wh.read(spark, "bl_hist").count()))

    // state tables are the STREAM's bare schemas — the audit columns the
    // step-written seed table carries must NOT leak into tables the
    // stream appends to (mixed-schema parquet dirs read
    // non-deterministically)
    assert(wh.read(spark, "bl_hist").columns.contains("nutzer"),
      "the COPY-written seed keeps the step audit columns")
    assert(wh.read(spark, "bl_seen").columns.sorted.toSeq == Seq("batch", "fingerprint"))
    assert(wh.read(spark, "bl_bloom").columns.sorted.toSeq == Seq("bits", "w"))

    // both batches landed, in arrival order
    val batches = wh.read(spark, "bl_admitted")
      .select("batch").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(batches == Seq(1L, 2L))

    // the expanded STREAM command is in the query log
    val queries = ledger.allQueries.map(_.sql)
    assert(queries.exists(q => q.startsWith("bloom_ingest_stream ") &&
      q.contains("seed=bl_hist")))
  }

  test("induced failure: a stream that cannot start fails the step, fallback compensates") {
    val (result, ledger, _) = EndToEnd.runStreamWorkflow(spark, sf, induceFailure = true)
    assert(!result.success && result.fallbackRan && result.error.isDefined)
    val rows = ledger.current
    def step(ref: Long) = rows.find(r => r.level == RunLevel.Schritt && r.refId == ref).get
    assert(step(5100L).erfolgreich, "the seed COPY completed before the failure")
    assert(step(5200L).istAbgeschlossen && !step(5200L).erfolgreich)
    assert(ledger.allErrors.exists(e => e.meldungstext.contains("step 5200 failed")),
      "the failed stream must log an error row")
    assert(step(5900L).istAbgeschlossen && step(5900L).erfolgreich,
      "the compensation step must execute after the failure")
    assert(rows.filter(_.level == RunLevel.Workflow)
      .forall(r => r.istAbgeschlossen && !r.erfolgreich))
  }

  test("the stream workflow runs under the SCHEDULER LOOP: each due tick drains one catch-up pass") {
    // the reference's always-on component is the scheduler loop
    // (Processor.cs:1110-1168) re-running a configured component per
    // tick — here each tick executes the STREAM workflow's bounded
    // AvailableNow drain, and a finished workflow is re-created for
    // its next slot, so consecutive ticks keep draining
    import java.time.{LocalDateTime}
    import graft.orchestrate.{SchedulerLoop, WorkflowManager}
    import graft.schedule.{Interval, Schedule}
    val base = LocalDateTime.of(2026, 3, 2, 9, 0, 0)
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(graft.orchestrate.WorkflowResult, Long)]
    val loop = new SchedulerLoop(new WorkflowManager,
      (wf, zid, _) => {
        assert(wf == 9)
        val (result, _, wh) = EndToEnd.runStreamWorkflow(spark, sf)
        results += ((result, wh.read(spark, "bl_admitted").count()))
      }, tickSeconds = 10)
    loop.register(9, Schedule(Interval.Minute, base, base.toLocalTime))
    assert(loop.tick(base) == Seq(9))
    assert(loop.tick(base.plusMinutes(1)) == Seq(9),
      "a finished stream workflow must be re-created for the next slot")
    assert(results.size == 2)
    results.foreach { case (r, admitted) =>
      assert(r.success && !r.fallbackRan)
      assert(admitted > 0, "each tick's drained pass must admit its arrivals")
    }
  }

  test("file_ingest_stream: the TRANSFER drop-folder pipeline as a STREAM step, exactly-once") {
    val base = tmpDir("graft-fi-step")
    val in = new java.io.File(s"$base/in"); in.mkdirs()
    def drop(name: String, rows: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(in, name))
      try { w.println("k,v"); rows.foreach(w.println) } finally w.close()
    }
    drop("a.csv", Seq("1,alpha", "2,beta"))
    drop("b.csv", Seq("3,gamma"))
    val ledger = new graft.ledger.RunLedger()
    val ctx = StepContext(spark,
      new graft.catalog.Warehouse(s"$base/wh"), ledger,
      graft.macros.Macros.Context(1L,
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0),
        java.time.LocalDateTime.of(2026, 1, 2, 0, 0)))
    val cmd = s"file_ingest_stream dir=$in ckpt=$base/ckpt archive=$base/arch " +
      "schema=\"k INT, v STRING\" " + s"out=$base/out producer=probe"
    val spec = StepSpec(7700, CommandType.Copy, TaskType.Stream, cmd,
      zieltabelle = Some("fi_out"))
    assert(Steps.execute(spec, ctx).contains(3L))

    // audit columns + values, straight off the sink's committed files
    val out = spark.read.parquet(s"$base/out")
    assert(out.columns.sorted.toSeq ==
      Seq("dateiname", "datenproduzent", "exportdatum", "k", "v"))
    val rows = out.select("k", "v", "dateiname", "datenproduzent")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set((1, "alpha", "a.csv", "probe"), (2, "beta", "a.csv", "probe"),
      (3, "gamma", "b.csv", "probe")))

    // exactly-once: a second drain with nothing new admits zero rows
    // (the checkpoint, not the archive move, is the dedup boundary —
    // cleanSource archives lazily on later batches, so watch-folder
    // emptiness is timing, not contract),
    // and a replayed file name lands once (fresh content, new file)
    assert(Steps.execute(spec, ctx).contains(0L))
    drop("c.csv", Seq("4,delta"))
    assert(Steps.execute(spec, ctx).contains(1L))
    assert(spark.read.parquet(s"$base/out").count() == 4L)

    // the expanded command is in the query log (one row per execute)
    assert(ledger.allQueries.map(_.sql).count(_.startsWith("file_ingest_stream ")) == 3)
  }

  test("STREAM step command parsing fails loudly; Zeitscheibe rejected; quoted values parse") {
    val ctx = StepContext(spark,
      new graft.catalog.Warehouse(graft.util.TempDirs.scratch("st-parse")),
      new graft.ledger.RunLedger(),
      graft.macros.Macros.Context(1L,
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0),
        java.time.LocalDateTime.of(2026, 1, 2, 0, 0)))
    val unknown = intercept[IllegalArgumentException](
      StreamTransforms.resolve("nonsense dir=x", ctx))
    assert(unknown.getMessage.contains("unknown STREAM transform"))
    assert(unknown.getMessage.contains("bloom_ingest_stream"))
    val sliced = intercept[IllegalArgumentException](Steps.execute(
      StepSpec(5002, CommandType.Copy, TaskType.Stream,
        "bloom_ingest_stream dir=x", zieltabelle = Some("x"), zeitscheibe = true), ctx))
    assert(sliced.getMessage.contains("Zeitscheibe"))
    // quoting: spaces survive inside double quotes, quotes are stripped
    val (name, params) = Transforms.parse("STREAM",
      """bloom_ingest_stream schema="doc_id BIGINT, fingerprint STRING" dir=/tmp/x""")
    assert(name == "bloom_ingest_stream")
    assert(params("schema") == "doc_id BIGINT, fingerprint STRING")
    assert(params("dir") == "/tmp/x")
  }
}
