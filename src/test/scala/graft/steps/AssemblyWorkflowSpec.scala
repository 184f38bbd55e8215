package graft.steps

import org.scalatest.funsuite.AnyFunSuite

import graft.model.RunLevel
import graft.queries.EndToEnd
import graft.testkit.SparkSupport

/** Ledger + chaining semantics of the q113 assembly workflow (r13) —
  * `budget_take` → `hash_split` → `token_pack` → `shard_shuffle` as
  * PIPELINE steps. The shard-placed VALUES are q113's DuckDB oracle's
  * job (all four stages recomposed from `documents`); this spec owns
  * the orchestration claims: run rows per stage, ErwarteteDaten
  * accounting, stage-table no-drift against the oracle-gated q82 body,
  * and the cascade/fallback path on a broken stage chain.
  */
class AssemblyWorkflowSpec extends AnyFunSuite with SparkSupport {

  private val sf = "/root/testdata/sf0.001"

  test("happy path: four chained stages, ledger accounts, stage tables match the gate bodies") {
    val (result, ledger, wh) = EndToEnd.runAssemblyWorkflow(spark, sf)
    assert(result.success && !result.fallbackRan && result.error.isEmpty)

    val rows = ledger.current
    def level(l: String) = rows.filter(_.level == l)
    assert(level(RunLevel.Paket).map(_.refId).sorted == Seq(81L, 82L, 83L, 84L))
    assert(level(RunLevel.Schritt).map(_.refId).sorted == Seq(8100L, 8200L, 8300L, 8400L))
    assert(level(RunLevel.Schritt).forall(r => r.istAbgeschlossen && r.erfolgreich))

    // stage chaining is real: the split step consumed the take step's
    // table (same id set), the packer consumed the split's train ids
    import org.apache.spark.sql.functions.col
    def ids(t: String) = wh.read(spark, t).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids("as_split") == ids("as_take"),
      "hash_split must run over exactly the budget take's rows")
    val train = wh.read(spark, "as_split").filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids("as_packs") == train,
      "token_pack must pack exactly the train split of the take")
    assert(ids("as_shards") == ids("as_packs"),
      "shard_shuffle must place exactly the packer's rows")
    // the shard step adds placement, never changes pack membership
    val packRows = wh.read(spark, "as_packs")
      .select("doc_id", "source", "n_tokens", "pack_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val shardRows = wh.read(spark, "as_shards")
      .select("doc_id", "source", "n_tokens", "pack_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(shardRows == packRows,
      "shard_shuffle must carry the pack columns through unchanged")

    // no drift vs the oracle-gated stage body: the step-written take ==
    // the q82 gate frame row-for-row
    val viaGate = graft.queries.Registry.byName("q82_token_budget_take")
      .run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val viaStep = wh.read(spark, "as_take")
      .select(col("doc_id"), col("source"), col("toks"), col("cum_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    spark.catalog.clearCache()
    assert(viaStep == viaGate, "budget_take step and q82 gate must not drift")

    // ErwarteteDaten counts each stage's written rows
    def step(ref: Long) = level(RunLevel.Schritt).find(_.refId == ref).get
    assert(step(8100L).erwarteteDaten.contains(ids("as_take").size.toLong))
    assert(step(8200L).erwarteteDaten.contains(ids("as_split").size.toLong))
    assert(step(8300L).erwarteteDaten.contains(ids("as_packs").size.toLong))
    assert(step(8400L).erwarteteDaten.contains(ids("as_shards").size.toLong))

    // the expanded PIPELINE commands are in the query log
    val queries = ledger.allQueries.map(_.sql)
    assert(queries.exists(_.startsWith("budget_take in=documents budget=800")))
    assert(queries.exists(_.startsWith("token_pack in=documents only=as_split")))
    assert(queries.exists(_.startsWith("shard_shuffle in=as_packs shards=8")))
  }

  test("induced failure: missing split table aborts the packer, fallback compensates") {
    val (result, ledger, _) = EndToEnd.runAssemblyWorkflow(spark, sf, induceFailure = true)
    assert(!result.success && result.fallbackRan && result.error.isDefined)
    val rows = ledger.current
    def stepRow(ref: Long) = rows.find(r => r.level == RunLevel.Schritt && r.refId == ref)
    assert(stepRow(8100L).exists(_.erfolgreich) && stepRow(8200L).exists(_.erfolgreich))
    assert(stepRow(8300L).exists(r => r.istAbgeschlossen && !r.erfolgreich))
    assert(stepRow(8400L).isEmpty,
      "the shard step is cascade-aborted after the packer fails — no run row")
    assert(stepRow(8900L).exists(r => r.istAbgeschlossen && r.erfolgreich),
      "the compensation step must execute after the failure")
  }
}
