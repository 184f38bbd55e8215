package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Winnowing document fingerprints — the local document-fingerprinting
  * algorithm of Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms
  * for Document Fingerprinting" (SIGMOD 2003; the MOSS recipe): hash
  * every k-token gram, slide a window of `w` consecutive gram hashes,
  * and keep the MINIMUM of each window. Guarantee: any shared run of at
  * least w+k-1 tokens between two documents yields at least one shared
  * fingerprint, while the selected set is ~2/(w+1) of the grams — the
  * partial-overlap detector that full-document fingerprints
  * ([[graft.functions.TextFunctions.fingerprintMd5]]/`fingerprintRolling`)
  * cannot be and MinHash only approximates globally.
  *
  * Scale shape (the q83 span-profile shape — never all-pairs): the
  * per-doc selection is MAP-SIDE array math on the intact doc row (one
  * materialized gram-hash array per doc — the r14 CodegenFallback
  * staging lesson from [[NearDup.signaturesWithRelease]]); overlap
  * statistics are one explode of the selected fingerprints, one
  * groupBy(fp) for document frequency, one equi-join back. A hot
  * fingerprint costs its membership, not its square.
  *
  * Tie rule: `array_min` keeps the minimum VALUE per window (ties by
  * value collapse — robust winnowing's rightmost-position rule matters
  * for positional fingerprints, which [[fingerprints]] deliberately
  * drops: the selected set is position-free, so value-equal ties are
  * one fingerprint anyway after the distinct).
  */
object Winnow {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftshim.ColumnBridge.column(e)
  private def unbridge(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftshim.ColumnBridge.expression(c)

  /** The portable composed forms of the two winnow stages — the
    * semantics references the DuckDB oracles mirror; parity with the
    * native kernels is pinned in SignatureExpressionsSpec.
    */
  private[graft] def composedGramHashes(t: org.apache.spark.sql.Column, k: Int) = {
    val _ = t // named-column expr form, mirroring the original
    expr(
      s"transform(sequence(1, size(t) - ${k - 1}), " +
        s"i -> cast(conv(substring(md5(concat_ws(' ', slice(t, i, $k))), 1, 8), 16, 10) as bigint))")
  }
  private[graft] def composedWinnowMins(gh: org.apache.spark.sql.Column, w: Int) = {
    val _ = gh
    array_distinct(expr(
      s"transform(sequence(1, greatest(1, size(gh) - ${w - 1})), " +
        s"i -> array_min(slice(gh, i, $w)))"))
  }

  /** Result frame + explicit release of the operator's staged persists
    * (idempotent; call after the terminal action on `frame`). */
  final case class Staged(frame: DataFrame, release: () => Unit)

  /** One (doc_id, fp) row per DISTINCT selected fingerprint of each
    * document. Docs with fewer than k tokens carry no grams and are
    * absent (they can never share a k-gram); docs with fewer than w
    * grams winnow to the minimum of what exists (the algorithm's
    * short-document rule — the doc still fingerprints).
    */
  def fingerprintsWithRelease(docs: DataFrame, k: Int = 5, w: Int = 4): Staged = {
    require(k >= 2, s"gram length k must be >= 2, got $k")
    require(w >= 1, s"window length w must be >= 1, got $w")
    val toks = docs
      .select(col("doc_id"), T.tokens(coalesce(col("text"), lit(""))).as("t"))
      .persist()
    // Native single-pass kernels (r15): the composed gram stage ran an
    // interpreted lambda per position with a slice + concat_ws
    // allocation each (gram hashing), and the window stage another
    // lambda per window with a w-sized slice each — O(len·w) churn. The
    // kernels reuse one digest/buffer per document and select window
    // minima with a monotonic deque — O(len) total. Value-exact parity
    // (incl. short docs and the n<w single-window rule) pinned in
    // SignatureExpressionsSpec; the gram-hash staging persist keeps its
    // r14 rationale (two consumers of `gh` would recompute the md5 pass).
    val grams = toks
      .filter(size(col("t")) >= k)
      .withColumn("gh", bridge(graft.functions.WordGramHash32(unbridge(col("t")), k)))
      .persist()
    val out = grams
      .withColumn("fp",
        bridge(graft.functions.SlidingMinDistinct(unbridge(col("gh")), w)))
      .select(col("doc_id"), explode(col("fp")).as("fp"))
    Staged(out, () => { grams.unpersist(); toks.unpersist(); () })
  }

  /** Raw gate form — persists are released by the registry runner's
    * `clearCache()`; services use the Staged surface. */
  private[graft] def fingerprints(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    fingerprintsWithRelease(docs, k, w).frame

  /** Corpus overlap profile over the winnowed fingerprints (the q83
    * span-profile shape): per doc its selected-fingerprint count, how
    * many of those recur in OTHER documents, and the hottest
    * fingerprint's document frequency. The detector's triage surface —
    * a doc whose shared share is high overlaps something, found without
    * ever enumerating pairs.
    */
  def profileWithRelease(docs: DataFrame, k: Int = 5, w: Int = 4): Staged = {
    val staged = fingerprintsWithRelease(docs, k, w)
    val fps = staged.frame.persist() // 2 consumers: df agg + join probe
    val dfreq = fps.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val out = fps.join(dfreq, "fp")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_fps"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared_fps"),
        max(col("df")).as("max_fp_df"))
    Staged(out, () => { fps.unpersist(); staged.release(); () })
  }

  /** Raw gate form — persists released by the registry runner. */
  private[graft] def profile(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    profileWithRelease(docs, k, w).frame

  /** The PAIR action on the winnowed fingerprints: document pairs
    * sharing at least `minShared` non-hot fingerprints, with the shared
    * count as the overlap score (the MOSS match list). `maxDf` caps the
    * fingerprints that may pair: a fingerprint in more than `maxDf`
    * documents is boilerplate (license headers, templates) whose
    * within-group pairing is |df|² — the standard winnowing practice of
    * dropping ubiquitous fingerprints, and the same hot-bucket cap
    * discipline as [[CosineNearDup]]. Shape: one self-join restricted
    * to the df-capped fingerprints (never uncapped all-pairs — a hot
    * fingerprint costs nothing, not its square), one groupBy(pair).
    */
  def pairsWithRelease(docs: DataFrame, k: Int = 5, w: Int = 4,
      minShared: Long = 2L, maxDf: Long = 8L): Staged = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 2, s"maxDf must be >= 2 (df < 2 cannot pair), got $maxDf")
    val staged = fingerprintsWithRelease(docs, k, w)
    val fps = staged.frame.persist() // 2 consumers: df agg + both join sides
    val pairable = fps.join(
      fps.groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2 && col("df") <= maxDf)
        .select(col("fp")),
      "fp")
    val out = pairable.as("l")
      .join(pairable.as("r"),
        col("l.fp") === col("r.fp") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    Staged(out, () => { fps.unpersist(); staged.release(); () })
  }

  /** Raw gate form — persists released by the registry runner. */
  private[graft] def pairs(docs: DataFrame, k: Int = 5, w: Int = 4,
      minShared: Long = 2L, maxDf: Long = 8L): DataFrame =
    pairsWithRelease(docs, k, w, minShared, maxDf).frame
}
