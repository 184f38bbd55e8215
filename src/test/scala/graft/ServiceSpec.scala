package graft

import java.time.LocalDateTime

import scala.concurrent.ExecutionContext

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.steps.{CommandType, TaskType}
import graft.testkit.SparkSupport

/** The full service host driven tick-by-tick: config loaded from
  * parquet, workflows scheduled and executed, ledger persisted on
  * shutdown — the reference's Worker loop end-to-end.
  */
class ServiceSpec extends AnyFunSuite with SparkSupport {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  private def writeConfig(dir: String): Unit = {
    import spark.implicits._
    val cfg = ConfigSet(
      workflows = Seq(WorkflowRow(1, 100, 10L, None, "svc-wf",
        uebernahmeVon = Some(LocalDateTime.of(1990, 1, 1, 0, 0)),
        uebernahmeBis = Some(LocalDateTime.of(1999, 1, 1, 0, 0)),
        uebernahmeTageRueckwirkend = None, parallelsperre = false, istAktiv = true)),
      pakete = Seq(PaketRow(10L, "svc-pkg", parallelsperre = false, istAktiv = true)),
      abhaengigkeiten = Seq.empty,
      umsetzungen = Seq(UmsetzungRow(100L, 1, Some(1L), parallelsperre = false, istAktiv = true)),
      paketUmsetzungen = Seq(PaketUmsetzungRow(1, 10L, 100L, 1, None)),
      schritte = Seq(SchrittRow(1000L, "copy-regions", TaskType.Sql, CommandType.Copy,
        "SELECT r_regionkey, r_name FROM region",
        zieltabelle = Some("regions_svc"), quelltabelle = Some("region"),
        parallelsperre = false, zeitscheibe = false, istAktiv = true)),
      umsetzungSchritte = Seq(UmsetzungSchrittRow(100L, 1000L, 1)),
      zeitplaene = Seq(ZeitplanRow(100, LocalDateTime.of(2026, 3, 1, 9, 0), None,
        "Minute", "09:00:00", 0, 0, anJedemTag = true, inJedemMonat = true,
        wochentage = Seq.empty, monate = Seq.empty, wocheDesMonats = 0,
        monatsletzter = false, sofortAusfuehrung = false)),
      emailVerteiler = Seq(
        EmailVerteilerRow(1, "ops@example", nurFehler = false, cc = false, istAktiv = true),
        EmailVerteilerRow(1, "err@example", nurFehler = true, cc = false, istAktiv = true)))
    cfg.workflows.toDS().write.mode("overwrite").parquet(s"$dir/workflows")
    cfg.pakete.toDS().write.mode("overwrite").parquet(s"$dir/pakete")
    cfg.umsetzungen.toDS().write.mode("overwrite").parquet(s"$dir/umsetzungen")
    cfg.paketUmsetzungen.toDS().write.mode("overwrite").parquet(s"$dir/paket_umsetzungen")
    cfg.schritte.toDS().write.mode("overwrite").parquet(s"$dir/schritte")
    cfg.umsetzungSchritte.toDS().write.mode("overwrite").parquet(s"$dir/umsetzung_schritte")
    cfg.zeitplaene.toDS().write.mode("overwrite").parquet(s"$dir/zeitplaene")
    cfg.emailVerteiler.toDS().write.mode("overwrite").parquet(s"$dir/email_verteiler")
  }

  test("service loop: parquet config -> scheduled execution per tick -> persisted ledger on shutdown") {
    val configDir = tmpDir("svc-cfg")
    val warehouseDir = tmpDir("svc-wh")
    val ledgerDir = tmpDir("svc-ledger")
    writeConfig(configDir)

    val cfg = Service.loadConfig(spark, configDir)
    assert(cfg.workflows.size == 1 && cfg.zeitplaene.size == 1)

    var now = LocalDateTime.of(2026, 3, 2, 9, 0, 55)
    val engine = new Service.Engine(spark, "/root/testdata/sf0.001", warehouseDir,
      cfg, Map(1 -> 100), clock = () => now)
    engine.start()

    // tick at 09:00:55: the next minutely slot (09:01:00) is within the
    // 10 s horizon → due
    assert(engine.tick(now) == Seq(1))
    val copied = spark.read.parquet(s"$warehouseDir/regions_svc")
    assert(copied.count() == 5)

    // tick mid-minute: the next slot (09:02:00) is out of the horizon
    now = LocalDateTime.of(2026, 3, 2, 9, 1, 10)
    assert(engine.tick(now).isEmpty)
    // just before the next slot: due again (appends)
    now = LocalDateTime.of(2026, 3, 2, 9, 1, 55)
    assert(engine.tick(now) == Seq(1))
    assert(spark.read.parquet(s"$warehouseDir/regions_svc").count() == 10)

    // result mail recorded per run: success skips the Nur_Fehler recipient
    val mails = engine.ledger.allMessages.filter(_.meldungstext.startsWith("result mail"))
    assert(mails.size == 2)
    assert(mails.forall(m => m.meldungstext.contains("ops@example") &&
      !m.meldungstext.contains("err@example")))

    // shutdown persists the ledger; all rows closed
    val closed = engine.shutdown(Some(ledgerDir))
    assert(closed == 0) // nothing in flight
    val events = spark.read.parquet(s"$ledgerDir/run_events")
    assert(events.filter("level = 'workflow'").select("id").distinct().count() == 2)
  }

  test("loadConfig round-trips the tenant-connection tables (flat Datenverbindungen form)") {
    import spark.implicits._
    import graft.model._
    import graft.sources.Connections
    val dir = tmpDir("svc-tenant-cfg")
    Seq(KonfigurationRow(7L, "cfg", 50L, 51L, istAktiv = true)).toDS()
      .write.parquet(s"$dir/konfigurationen")
    Seq(MandantVerbindungRow(1, 51L, 501L)).toDS()
      .write.parquet(s"$dir/mandanten_verbindungen")
    Seq(
      DatenverbindungFlatRow(501L, "wh-a", "parquet", pfad = Some("/tmp/wh-a")),
      DatenverbindungFlatRow(502L, "drop", "csv", pfad = Some("/tmp/drop")),
      DatenverbindungFlatRow(503L, "db", "jdbc", url = Some("jdbc:derby:x"),
        benutzer = Some("u"), kennwort = Some("p"))).toDS()
      .write.parquet(s"$dir/datenverbindungen")
    val cfg = Service.loadConfig(spark, dir)
    assert(cfg.konfigurationen.size == 1 && cfg.mandantenVerbindungen.size == 1)
    val specs = cfg.datenverbindungen.map(d => d.datenverbindungenId -> d.spec).toMap
    assert(specs(501L) == Connections.ParquetDir("/tmp/wh-a"))
    assert(specs(502L) == Connections.CsvDir("/tmp/drop"))
    assert(specs(503L) ==
      Connections.Jdbc("jdbc:derby:x", "u", "p", None))
    // a malformed typ refuses to load rather than mis-routing silently
    intercept[IllegalArgumentException] {
      DatenverbindungFlatRow(504L, "bad", "excel").toRow
    }
  }

  test("conf.Konfigurationsparameter drives the service knobs; malformed values keep defaults") {
    import graft.catalog.ConfigAssembly
    import graft.model.{ConfigSet, KonfigurationsparameterRow => P}
    // defaults are the reference's stdNumThreads/stdDebug/stdLogInterval
    assert(ConfigAssembly.serviceParams(ConfigSet(Seq.empty, Seq.empty, Seq.empty,
      Seq.empty, Seq.empty, Seq.empty, Seq.empty)) ==
      ConfigAssembly.ServiceParams(1, debug = false, 5))
    val cfg = ConfigSet(Seq.empty, Seq.empty, Seq.empty, Seq.empty, Seq.empty,
      Seq.empty, Seq.empty,
      konfigurationsparameter = Seq(
        P("Anzahl_ETL_Threads", "8"),
        P("Debug", "1"),
        P("LogInterval", "not-a-number"), // malformed -> default, like the reference's catch
        P("Unbekannt", "x")))             // unknown name ignored
    assert(ConfigAssembly.serviceParams(cfg) ==
      ConfigAssembly.ServiceParams(8, debug = true, 5))
  }
}
