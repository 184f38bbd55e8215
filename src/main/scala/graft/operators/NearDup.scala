package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** MinHash-LSH near-duplicate clustering as ONE implementation (r13,
  * VERDICT next #3): the signal (band-collision component labels, the
  * q88/q104 bodies) and the action (per-cluster prune manifest, the
  * q95 body) extracted from the gate registry so the PIPELINE workflow
  * steps ([[graft.steps.Transforms]] `neardup_components` /
  * `neardup_prune`) execute literally the same plans the DuckDB-
  * oracled gates prove — the no-drift rule the curation stages already
  * follow ([[Curation]]).
  *
  * Scale shape (unchanged from the gates): shingle → minhash → banded
  * blocking, components over the BUCKET frame (doc–doc edges never
  * materialize — a hot band costs its membership, not its square;
  * [[ConnectedComponents]] scaladoc), labels propagated to singletons
  * by a left join against the corpus id set.
  */
object NearDup {

  /** Result frame + explicit release of the operator's staged persists
    * (idempotent; call after the terminal action on `frame`). */
  final case class Staged(frame: DataFrame, release: () => Unit)

  /** An admission's result plus the BATCH SIGNATURE frame it computed
    * on the way (persisted until `release`) — the streaming lifecycle
    * appends the admitted docs' signatures/bands to the history, and
    * recomputing them from text would pay the whole tokenize → shingle
    * → minhash pass a second time per micro-batch (r15). */
  final case class Admission(frame: DataFrame, batchSig: DataFrame,
      release: () => Unit)

  /** (doc_id, cluster_id) for EVERY input doc — cluster_id is the
    * minimum doc_id reachable through band-key collisions; docs with no
    * shingles or no collisions label themselves.
    *
    * `algo` (r14, VERDICT r13 next #6 — auto IS the default now):
    * "auto" probes with min-label propagation and restarts as star
    * contraction if labels still move after the probe rounds
    * ([[ConnectedComponents.auto]] — picks the measured winner on both
    * FANIN probe shapes); "propagation" / "stars" force one path (the
    * q88/q104 gates pin each algorithm individually — the labels are
    * identical either way, so the dispatch can never change results).
    * `onDispatch` observes the algorithm that actually ran — the
    * workflow step's message-log hook.
    */
  def componentLabelsWithRelease(docs: DataFrame, k: Int = 12, bands: Int = 4,
      algo: String = "auto", onDispatch: String => Unit = _ => ()): Staged = {
    require(k % bands == 0, s"minhash length $k must divide into $bands bands")
    val rows = k / bands
    val toks = docs.select(col("doc_id"), T.tokens(col("text")).as("t")).persist()
    val sh = toks
      .select(col("doc_id"), T.shingles("t").as("shingles"))
      .withColumn("hashes", transform(col("shingles"), x => T.hash32(x)))
      .persist()
    val sig = sh.filter(size(col("shingles")) > 0)
      .withColumn("sig", T.minhashFromHashes(col("hashes"), k))
      .select(col("doc_id"), col("sig"))
    val bandFrame = sig.select(
      col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("b"), T.bandKey(col("sig"), b, rows).as("key"))): _*)).as("band"))
      .select(col("doc_id"), col("band.b"), col("band.key"))
    val cc = algo match {
      case "auto" =>
        ConnectedComponents.auto(bandFrame, "doc_id", Seq("b", "key"),
          onDispatch = onDispatch)
      case "propagation" =>
        onDispatch("propagation (forced)")
        ConnectedComponents.viaBuckets(bandFrame, "doc_id", Seq("b", "key"))
      case "stars" =>
        onDispatch("stars (forced)")
        ConnectedComponents.viaStars(bandFrame, "doc_id", Seq("b", "key"))
      case other => throw new IllegalArgumentException(
        s"unknown components algorithm '$other' (known: auto, propagation, stars)")
    }
    val out = docs.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("cluster_id"))
    Staged(out, () => { sh.unpersist(); toks.unpersist(); () })
  }

  /** Raw gate form — persists are released by the registry runner's
    * `clearCache()`; services use the Staged surface. */
  private[graft] def componentLabels(docs: DataFrame, k: Int = 12, bands: Int = 4,
      algo: String = "auto"): DataFrame =
    componentLabelsWithRelease(docs, k, bands, algo).frame

  /** (doc_id, shingles, sig) — the persisted signature artifact an
    * incremental admission keeps as its HISTORIC table: computed once
    * per corpus snapshot (the q15 scaladoc's checkpointed-signature-
    * table reading, now a first-class frame a workflow materializes),
    * appended to as batches are admitted. Docs with no shingles carry
    * nothing to collide on and are excluded — they can never be
    * near-dups, so an admission checks them against nothing.
    *
    * The hash array is MATERIALIZED (persist) before the minhash runs —
    * higher-order array expressions are CodegenFallback, and fusing
    * `minhash(transform(shingles, hash32))` into one projection leaves
    * the whole per-shingle hash pass inside a deep interpreted subtree
    * (measured 8× slower warm than the two shallow cached projections
    * q14's pipeline uses; Q123 probe, r14). Same staging discipline as
    * [[componentLabelsWithRelease]].
    */
  def signaturesWithRelease(docs: DataFrame, k: Int = 12): Staged = {
    val toks = docs.select(col("doc_id"), T.tokens(col("text")).as("t")).persist()
    val sh = toks
      .select(col("doc_id"), T.shingles("t").as("shingles"))
      .withColumn("hashes", transform(col("shingles"), x => T.hash32(x)))
      .persist()
    val out = sh.filter(size(col("shingles")) > 0)
      .withColumn("sig", T.minhashFromHashes(col("hashes"), k))
      .select(col("doc_id"), col("shingles"), col("sig"))
    Staged(out, () => { sh.unpersist(); toks.unpersist(); () })
  }

  /** Raw gate form — persists released by the registry runner's
    * `clearCache()`; services use the Staged surface. */
  private[graft] def signatures(docs: DataFrame, k: Int = 12): DataFrame =
    signaturesWithRelease(docs, k).frame

  /** Band frame from a signature frame — shared by the components path
    * and the incremental admission so the banding scheme cannot drift. */
  private def bandsOf(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(
      col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("b"), T.bandKey(col("sig"), b, rows).as("key"))): _*)).as("band"))
      .select(col("doc_id"), col("band.b"), col("band.key"))

  /** [[bandsOf]] with the NUMERIC 64-bit band key ([[graft.functions
    * .TextFunctions.bandKey64]]) — the layout of the PERSISTED band
    * table a manifest-pruned admission probes: (doc_id, b, key64). */
  private def bands64Of(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(
      col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("b"), T.bandKey64(col("sig"), b, rows).as("key64"))): _*)).as("band"))
      .select(col("doc_id"), col("band.b"), col("band.key64"))

  /** The persisted BAND-TABLE artifact of a signature frame (r15,
    * VERDICT r14 next #2): one (doc_id, b, key64) row per LSH band,
    * with the numeric key a stats manifest can envelope. A workflow
    * materializes this beside the signature table, lays it out with
    * `optimize_zorder cols=key64` + `refresh_stats cols=key64`, and
    * appends to it with `ids=` exactly as it appends admitted
    * signatures — the band table must COVER the signature table
    * (a history doc missing its band rows is invisible to the probe).
    */
  def bandTable(sig: DataFrame, k: Int = 12, bands: Int = 4): DataFrame = {
    require(k % bands == 0, s"minhash length $k must divide into $bands bands")
    bands64Of(sig, bands, k / bands)
  }

  /** Incremental near-dup ADMISSION (r14) — the MinHash twin of the
    * bloom incremental dedup ([[Bloom.newKeysAgainst]]): admit each
    * batch doc iff NO document of the historic signature table shares
    * an LSH band with it AND confirms exact shingle-Jaccard ≥
    * `threshold`. Batch-internal near-dups are deliberately NOT the
    * admission's concern (run the batch dedup family first); this
    * operator answers "is it new vs everything already kept" without
    * ever recomputing the history.
    *
    * Scale shape (the r14 bloom-confirm direction, applied twice): the
    * batch is small by the operator's contract and `histSig` is
    * corpus-scale, so the band probe streams the historic table past a
    * BROADCAST of the batch's bands, and the shingle-confirm streams it
    * once more past a broadcast of the candidate ids — two historic
    * scans, zero historic shuffles, per-batch shuffle bytes independent
    * of the history's size. Returns the ADMITTED batch docs as
    * (doc_id, n_hist_candidates) — candidates that failed the exact
    * confirm count toward the telemetry column; docs with no shingles
    * admit with 0 candidates.
    *
    * `broadcastBatch` (r15, VERDICT r14 wrong #1 — the Bloom
    * `broadcastConfirm` discipline applied here): the three broadcast
    * hints hold ONLY under the micro-batch contract. The step surface
    * (`neardup_admit`) accepts any warehouse table as the batch, and a
    * corpus-sized batch under unconditional hints would pin
    * corpus-scale band/candidate frames on every executor. With
    * `broadcastBatch = false` no hint is planted — the join DIRECTION
    * stays flipped (the history still streams, never builds a hash
    * table by hint) and AQE picks broadcast-vs-shuffle from the
    * frames' runtime sizes, so a corpus-sized one-shot degrades to a
    * shuffle instead of an executor OOM. Row-identical either way
    * (OperatorsSpec pins it).
    */
  def admitAgainstWithRelease(batch: DataFrame, histSig: DataFrame, k: Int = 12,
      bands: Int = 4, threshold: Double = 0.6,
      broadcastBatch: Boolean = true): Staged = {
    val a = admissionAgainst(batch, histSig, k, bands, threshold, broadcastBatch)
    Staged(a.frame, a.release)
  }

  /** [[admitAgainstWithRelease]] returning the [[Admission]] surface
    * (result + the batch signature frame, for history appends). */
  def admissionAgainst(batch: DataFrame, histSig: DataFrame, k: Int = 12,
      bands: Int = 4, threshold: Double = 0.6,
      broadcastBatch: Boolean = true): Admission = {
    require(k % bands == 0, s"minhash length $k must divide into $bands bands")
    val rows = k / bands
    def hinted(df: DataFrame): DataFrame = if (broadcastBatch) broadcast(df) else df
    val bstage = signaturesWithRelease(batch, k)
    val bsig = bstage.frame.persist() // batch-sized; 3 consumers
    val bBands = bandsOf(bsig, bands, rows)
      .withColumnRenamed("doc_id", "new_id")
    val cand = bandsOf(histSig, bands, rows)
      .withColumnRenamed("doc_id", "hist_id")
      .join(hinted(bBands), Seq("b", "key"))
      .select(col("hist_id"), col("new_id"))
      .distinct()
      .persist() // candidate-sized; 2 consumers (confirm + telemetry count)
    val confirmed = histSig
      .select(col("doc_id").as("hist_id"), col("shingles").as("sh_h"))
      .join(hinted(cand), Seq("hist_id"))
      .join(hinted(bsig.select(col("doc_id").as("new_id"),
        col("shingles").as("sh_n"))), Seq("new_id"))
      .filter(T.jaccard(col("sh_n"), col("sh_h")) >= threshold)
      .select(col("new_id"))
      .distinct()
    val nCand = cand.groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_hist_candidates"))
    val out = batch.select(col("doc_id"))
      .join(confirmed.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left_anti")
      .join(nCand.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hist_candidates"), lit(0L)).as("n_hist_candidates"))
    Admission(out, bsig,
      () => { cand.unpersist(); bsig.unpersist(); bstage.release(); () })
  }

  /** Raw gate form — persists released by the registry runner's
    * `clearCache()`; services use the Staged surface. */
  private[graft] def admitAgainst(batch: DataFrame, histSig: DataFrame, k: Int = 12,
      bands: Int = 4, threshold: Double = 0.6,
      broadcastBatch: Boolean = true): DataFrame =
    admitAgainstWithRelease(batch, histSig, k, bands, threshold, broadcastBatch).frame

  /** MANIFEST-PRUNED incremental admission (r15, VERDICT r14 next #2) —
    * [[admitAgainstWithRelease]] with both historic scans planned
    * through the warehouse stats manifests, so per-batch admission WALL
    * is sublinear in the history instead of paying two full scans:
    *
    *   - the band probe reads only the `bandsTable` part files whose
    *     key64 envelope contains at least one of the batch's band keys
    *     ([[graft.catalog.Warehouse.statsPrunedScanKeys]] — a z-ordered
    *     band table schedules ≈ |batch·bands| files out of any history);
    *   - the shingle confirm reads only the `histTable` part files whose
    *     doc_id envelope contains a surviving candidate id.
    *
    * Both probe-key sets are driver-collected under the batch-sized
    * contract; if either exceeds `maxProbeKeys` the corresponding scan
    * falls back to the FULL table read (correct, just unpruned — the
    * same degrade-not-OOM posture as `broadcastBatch = false`).
    * Freshness: files appended since the last `refresh_stats` have no
    * manifest row and are always scanned, so staleness costs pruning
    * quality, never rows. `bandsTable` must cover `histTable` — it is
    * appended to by the same `ids=`-chained lifecycle step that appends
    * admitted signatures. Results are row-identical to the unpruned
    * admission (OperatorsSpec pins equality; a 64-bit band-key
    * collision can only add a candidate, which the exact confirm
    * rejects). `onPrune` observes (scan, scheduled, total) per historic
    * scan — the step surface's message-log/telemetry hook.
    */
  def admitAgainstPrunedWithRelease(spark: SparkSession,
      warehouse: graft.catalog.Warehouse, batch: DataFrame,
      histTable: String, bandsTable: String, k: Int = 12, bands: Int = 4,
      threshold: Double = 0.6, broadcastBatch: Boolean = true,
      maxProbeKeys: Int = 1 << 16,
      onPrune: (String, Int, Int) => Unit = (_, _, _) => ()): Staged = {
    val a = admissionPruned(spark, warehouse, batch, histTable, bandsTable,
      k, bands, threshold, broadcastBatch, maxProbeKeys, onPrune)
    Staged(a.frame, a.release)
  }

  /** [[admitAgainstPrunedWithRelease]] returning the [[Admission]]
    * surface (result + the batch signature frame, for history appends). */
  def admissionPruned(spark: SparkSession,
      warehouse: graft.catalog.Warehouse, batch: DataFrame,
      histTable: String, bandsTable: String, k: Int = 12, bands: Int = 4,
      threshold: Double = 0.6, broadcastBatch: Boolean = true,
      maxProbeKeys: Int = 1 << 16,
      onPrune: (String, Int, Int) => Unit = (_, _, _) => ()): Admission = {
    require(k % bands == 0, s"minhash length $k must divide into $bands bands")
    val rows = k / bands
    def hinted(df: DataFrame): DataFrame = if (broadcastBatch) broadcast(df) else df
    val bstage = signaturesWithRelease(batch, k)
    val bsig = bstage.frame.persist() // batch-sized; 3 consumers
    val bBands = bands64Of(bsig, bands, rows)
      .withColumnRenamed("doc_id", "new_id")
      .persist() // batch-sized; 2 consumers (probe-key collect + join)
    // batch band keys, driver-collected (≤ |batch|·bands by contract)
    val probeKeys = bBands.select(col("key64")).distinct()
      .limit(maxProbeKeys + 1).collect().map(_.getLong(0)).toSeq
    val histBands =
      if (probeKeys.size > maxProbeKeys) {
        onPrune("bands", -1, -1) // over cap: full scan, no pruning claimed
        warehouse.read(spark, bandsTable)
      } else {
        val scan = warehouse.statsPrunedScanKeys(spark, bandsTable, "key64", probeKeys)
        onPrune("bands", scan.scheduled, scan.total)
        scan.frame
      }
    val cand = histBands
      .withColumnRenamed("doc_id", "hist_id")
      .join(hinted(bBands), Seq("b", "key64"))
      .select(col("hist_id"), col("new_id"))
      .distinct()
      .persist() // candidate-sized; 3 consumers (id collect, confirm, telemetry)
    val candIds = cand.select(col("hist_id")).distinct()
      .limit(maxProbeKeys + 1).collect().map(_.getLong(0)).toSeq
    val histShingles =
      if (candIds.size > maxProbeKeys) {
        onPrune("signatures", -1, -1)
        warehouse.read(spark, histTable)
      } else {
        val scan = warehouse.statsPrunedScanKeys(spark, histTable, "doc_id", candIds)
        onPrune("signatures", scan.scheduled, scan.total)
        scan.frame
      }
    val confirmed = histShingles
      .select(col("doc_id").as("hist_id"), col("shingles").as("sh_h"))
      .join(hinted(cand), Seq("hist_id"))
      .join(hinted(bsig.select(col("doc_id").as("new_id"),
        col("shingles").as("sh_n"))), Seq("new_id"))
      .filter(T.jaccard(col("sh_n"), col("sh_h")) >= threshold)
      .select(col("new_id"))
      .distinct()
    val nCand = cand.groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_hist_candidates"))
    val out = batch.select(col("doc_id"))
      .join(confirmed.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left_anti")
      .join(nCand.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hist_candidates"), lit(0L)).as("n_hist_candidates"))
    Admission(out, bsig, () => { cand.unpersist(); bBands.unpersist();
      bsig.unpersist(); bstage.release(); () })
  }

  /** The prune ACTION on a complete labeling (the q95 body): one row
    * per surviving document (the cluster representative = the min-id
    * member, which IS the label), with member count and the character
    * mass dropped with the non-representatives. One groupBy(cluster)
    * over the labeling — no new join class.
    */
  def pruneManifest(docs: DataFrame, labels: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("n_chars"))
      .join(labels.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(when(col("doc_id") === col("cluster_id"), lit(0L))
          .otherwise(col("n_chars"))).as("chars_dropped"))
      .select(col("cluster_id").as("doc_id"), col("n_members"), col("chars_dropped"))
}
