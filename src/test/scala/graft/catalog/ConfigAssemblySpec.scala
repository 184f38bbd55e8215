package graft.catalog

import java.time.LocalDateTime

import scala.concurrent.ExecutionContext

import org.scalatest.funsuite.AnyFunSuite

import graft.ledger.RunLedger
import graft.model._
import graft.orchestrate._
import graft.schedule.Interval
import graft.steps.{CommandType, StepContext, TaskType}
import graft.testkit.SparkSupport

/** FIXTURES.md §6: the minimum end-to-end slice driven entirely from
  * control-plane config rows — assembly walks the same join chain the
  * reference reads from MSSQL, and the assembled spec runs through the
  * orchestrator against real data.
  */
class ConfigAssemblySpec extends AnyFunSuite with SparkSupport {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  private def slice: ConfigSet = ConfigSet(
    workflows = Seq(WorkflowRow(1, 100, 10L, None, "e2e-slice",
      uebernahmeVon = Some(LocalDateTime.of(1990, 1, 1, 0, 0)),
      uebernahmeBis = Some(LocalDateTime.of(1999, 1, 1, 0, 0)),
      uebernahmeTageRueckwirkend = None, parallelsperre = false, istAktiv = true)),
    pakete = Seq(
      PaketRow(10L, "master", parallelsperre = false, istAktiv = true),
      PaketRow(11L, "staging", parallelsperre = false, istAktiv = true)),
    abhaengigkeiten = Seq(AbhaengigkeitRow(1, 10L, 11L, istAktiv = true)),
    umsetzungen = Seq(
      UmsetzungRow(100L, anzahlParalleleSchritte = 1, etlKonfigurationenId = Some(7L),
        parallelsperre = false, istAktiv = true),
      UmsetzungRow(110L, anzahlParalleleSchritte = 1, etlKonfigurationenId = Some(7L),
        parallelsperre = false, istAktiv = true)),
    paketUmsetzungen = Seq(
      PaketUmsetzungRow(1, 10L, 100L, paketPriorisierung = 1, mandantenId = None),
      PaketUmsetzungRow(1, 11L, 110L, paketPriorisierung = 1, mandantenId = None)),
    schritte = Seq(
      SchrittRow(1000L, "prepare", TaskType.Sql, CommandType.SqlTarget,
        "CREATE OR REPLACE TEMP VIEW cfg_li_src AS SELECT l_orderkey, l_quantity " +
          "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'",
        zieltabelle = None, quelltabelle = Some("lineitem"),
        parallelsperre = false, zeitscheibe = false, istAktiv = true),
      SchrittRow(1001L, "copy", TaskType.Sql, CommandType.Copy,
        "SELECT * FROM cfg_li_src",
        zieltabelle = Some("lineitem_copy_cfg"), quelltabelle = Some("cfg_li_src"),
        parallelsperre = false, zeitscheibe = false, istAktiv = true),
      SchrittRow(1002L, "staging-noop", TaskType.Sql, CommandType.Test, "0.01",
        zieltabelle = None, quelltabelle = None,
        parallelsperre = false, zeitscheibe = false, istAktiv = true),
      SchrittRow(1003L, "inactive", TaskType.Sql, CommandType.Test, "99",
        zieltabelle = None, quelltabelle = None,
        parallelsperre = false, zeitscheibe = false, istAktiv = false)),
    umsetzungSchritte = Seq(
      UmsetzungSchrittRow(100L, 1000L, 1),
      UmsetzungSchrittRow(100L, 1001L, 2),
      UmsetzungSchrittRow(100L, 1003L, 3), // inactive: must be dropped
      UmsetzungSchrittRow(110L, 1002L, 1)),
    zeitplaene = Seq(ZeitplanRow(100, LocalDateTime.of(2026, 1, 1, 6, 0), None,
      "Täglich", "06:00:00", 0, 0, anJedemTag = true, inJedemMonat = true,
      wochentage = Seq.empty, monate = Seq.empty, wocheDesMonats = 0,
      monatsletzter = false, sofortAusfuehrung = true)))

  test("assembly: reachable packages, priorities, ordered steps, inactive rows dropped") {
    val spec = ConfigAssembly.workflowSpec(1, slice)
    assert(spec.masterPackageId == 10L)
    assert(spec.packages.keySet == Set(10L, 11L))
    assert(spec.packages(10L).dependencies == Seq(11L))
    val steps = spec.packages(10L).realizations.head.steps
    assert(steps.map(_.id) == Seq(1000L, 1001L)) // ordered, inactive dropped
    assert(steps(1).quelltabelle.contains("cfg_li_src"))
  }

  test("assembled schedule maps interval names and masks") {
    val sched = ConfigAssembly.schedule(slice.zeitplaene.head)
    assert(sched.interval == Interval.Taeglich)
    assert(sched.sofortAusfuehrung)
  }

  test("the assembled spec runs end-to-end: config rows -> workflow run -> written table + ledger") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val ledger = new RunLedger(() => LocalDateTime.of(2026, 2, 1, 12, 0, 0))
    val wh = new Warehouse(tmpDir("cfg-wh"))
    val runner = new WorkflowRunner(
      new WorkflowManager, ledger, new Gates.ThreadCap(8),
      new Gates.TableLocks, new Gates.ParallelLocks,
      clock = () => LocalDateTime.of(2026, 2, 1, 12, 0, 0))
    val spec = ConfigAssembly.workflowSpec(1, slice)
    val result = runner.run(spec, 99,
      (m, stepRunId, confId) =>
        StepContext(spark, wh, ledger, m, schrittRunId = stepRunId, konfigurationenId = confId))
    assert(result.success, s"failed: ${result.error}")
    val expected = spark.sql(
      "SELECT count(*) FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'")
      .head.getLong(0)
    assert(wh.read(spark, "lineitem_copy_cfg").count() == expected)
    // dependency package 11 ran before 10 and produced ledger rows
    assert(ledger.current.exists(r => r.level == RunLevel.Paket && r.refId == 11L && r.erfolgreich))
    // the config ids flowed through to the query log
    assert(ledger.allQueries.forall(_.konfigurationenId.contains(7L)))
  }

  test("config round-trips through parquet as typed Datasets") {
    import spark.implicits._
    val dir = tmpDir("cfg-parquet")
    slice.schritte.toDS().write.mode("overwrite").parquet(s"$dir/schritte")
    val back = spark.read.parquet(s"$dir/schritte").as[SchrittRow].collect()
    assert(back.toSet == slice.schritte.toSet)
  }
}
