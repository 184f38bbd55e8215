package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Exact-substring dedup over token spans — the Lee-et-al ExactSubstr
  * family (public recipe: "Deduplicating Training Data Makes Language
  * Models Better"): [[profile]] computes the corpus-global repeated-span
  * SIGNAL (the q83 gate), [[removal]] performs the ACTION — per doc, the
  * merged cut-list of hot-span positions and the cleaned token stream
  * with those spans excised (the q84 gate).
  *
  * Shape (both): one explode to spans, one groupBy(span) for document
  * frequency, one equi-join back on the span, then per-doc work — never
  * all-pairs. The span stage is persisted because the df aggregate and
  * the join probe both consume it and the aggregate side's exchange
  * embeds a partial agg, so ReuseExchange cannot unify the two scans;
  * at cluster scale this stage is a checkpointed table.
  *
  * Persist lifecycle: the public surface returns [[Staged]] — the result
  * frame plus an explicit `release()` for the staged persists — or the
  * loan-pattern `…Managed` form (released in `finally`). A long-lived
  * service composing these operators must call `release()` after the
  * terminal action (VERDICT r10: the bare-persist form leaked outside
  * Bench/Verify's `clearCache()`); the `private[graft]` raw forms exist
  * for the gate registry, whose contract is exactly that `clearCache()`.
  *
  * Span keying: by default the shuffle/join key is a 128-bit hash of the
  * span string (two independently-seeded xxhash64s, 16 B wide) — the
  * 100 TB shape, since an 8-token span string averages ~50 B and the key
  * is carried through a corpus-sized explode, a distinct, a groupBy and
  * a join. `stringKeys = true` keys on the span text itself; the q85
  * gate proves on the real corpus that both keyings produce identical
  * results (a 128-bit collision needs ~2^64 distinct spans).
  */
object ExactSubstr {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftshim.ColumnBridge.column(e)
  private def unbridge(c: Column) =
    org.apache.spark.sql.graftshim.ColumnBridge.expression(c)

  /** The portable composed forms of the two removal stages the r16
    * native kernels replace — the semantics references the DuckDB
    * oracles mirror; parity with [[graft.functions.SpanStarts]] /
    * [[graft.functions.ExciseByIntervals]] is pinned in
    * SignatureExpressionsSpec.
    */
  private[graft] def composedStarts(n: Int): Column =
    expr(s"transform(sequence(1, size(t) - ${n - 1}), " +
      s"i -> struct(i AS s, concat_ws(' ', slice(t, i, $n)) AS g))")
  private[graft] def composedKept: Column =
    expr("CASE WHEN cuts IS NULL THEN t " +
      "ELSE filter(t, (x, i) -> NOT exists(cuts, " +
      "c -> i + 1 >= c.cut_start AND i + 1 <= c.cut_end)) END")

  /** Result frame + explicit release of the operator's staged persists
    * (idempotent; call after the terminal action on `frame`). */
  final case class Staged(frame: DataFrame, release: () => Unit)

  /** 128-bit span key: two independently-seeded xxhash64s over the span
    * text. 16 bytes on the wire vs ~50 B for the 8-token string. */
  private def hashKey(g: Column): Column =
    struct(xxhash64(lit(1), g).as("h1"), xxhash64(lit(2), g).as("h2"))

  private def spanKey(g: Column, stringKeys: Boolean): Column =
    if (stringKeys) g else hashKey(g)

  // ---------------------------------------------------------------- profile

  /** Corpus-global repeated-span profile (the q83 gate): per doc the
    * distinct-span count, how many of its spans recur in other docs, and
    * the hottest span's document frequency.
    */
  def profileWithRelease(docs: DataFrame, n: Int = 8,
      stringKeys: Boolean = false): Staged = {
    val spans = docs
      .select(col("doc_id"), T.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(T.shingles("t", n)).as("g"))
      .select(col("doc_id"), spanKey(col("g"), stringKeys).as("k"))
      .persist()
    val dfreq = spans.groupBy(col("k")).agg(count(lit(1)).as("df"))
    val out = spans.join(dfreq, "k")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared_spans"),
        max(col("df")).as("max_span_df"))
    Staged(out, () => { spans.unpersist(); () })
  }

  /** Loan-pattern [[profileWithRelease]] for lexically-scoped use. */
  def profileManaged[U](docs: DataFrame, n: Int = 8,
      stringKeys: Boolean = false)(use: DataFrame => U): U = {
    val staged = profileWithRelease(docs, n, stringKeys)
    try use(staged.frame) finally staged.release()
  }

  /** Raw gate form — persists are released by the registry runner's
    * `clearCache()`; services use the Staged/Managed surface. */
  private[graft] def profile(docs: DataFrame, n: Int = 8,
      stringKeys: Boolean = false): DataFrame =
    profileWithRelease(docs, n, stringKeys).frame

  // ---------------------------------------------------------------- removal

  /** Exact-substring span removal (the q84 gate): for every doc, the
    * merged cut-list of hot spans (corpus document frequency ≥ `minDf`)
    * and the cleaned token stream with those positions excised.
    *
    * Cut semantics (pinned by the oracle + CurationSpec fixture):
    *   - a hot span starting at 1-based token position s covers
    *     positions [s, s+n-1];
    *   - covered ranges that overlap OR are adjacent (next start ≤
    *     current end + 1, i.e. zero kept tokens between them) merge into
    *     one cut;
    *   - `cut_list` renders the merged cuts as "start-end" joined by
    *     ";" in position order, "" when the doc has none;
    *   - `cleaned_text` is the kept tokens joined by single spaces over
    *     the whitespace-normalized token stream ("" when everything is
    *     cut); docs shorter than n tokens have no spans and pass
    *     through whole.
    *
    * Distributed shape: spans explode once and are persisted (df agg +
    * hot-join both consume them); hot starts run gaps-and-islands under
    * a per-doc window (one shuffle on doc_id); the kept stream is
    * computed map-side on the intact doc row by walking the doc's
    * MERGED CUT INTERVALS (disjoint and sorted by construction —
    * O(n_cuts) carried per row, never a per-position cover array; r15;
    * native one-pointer kernel r16) — the corpus is never exploded to
    * per-token rows and rebuilt.
    */
  def removalWithRelease(docs: DataFrame, n: Int = 8, minDf: Long = 2L,
      stringKeys: Boolean = false): Staged = {
    require(n >= 2, s"span length n must be >= 2, got $n")
    require(minDf >= 2, s"minDf must be >= 2 (df >= 2 is the smallest cross-doc signal), got $minDf")
    // NULL text coalesces to '' so the pass-through row carries an empty
    // cleaned_text, not NULL (tokens(NULL) is NULL and array_join(NULL)
    // propagates it — r11 review; span extraction itself was safe, the
    // size(t) >= n filter rejects the NULL size)
    val toked = docs
      .select(col("doc_id"), T.tokens(coalesce(col("text"), lit(""))).as("t"))
      .persist()
    // every span OCCURRENCE with its 1-based start position (the profile
    // uses distinct spans; removal needs positions). Native one-pass
    // kernel (r16): the composed transform(sequence(...)) ran an
    // interpreted lambda per position, each allocating an n-sized slice
    // before the concat, on this full-corpus explode pass —
    // [[composedStarts]] keeps the semantics reference, parity pinned in
    // SignatureExpressionsSpec.
    val starts = toked
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(
        bridge(graft.functions.SpanStarts(unbridge(col("t")), n))).as("sp"))
      .select(col("doc_id"), col("sp.s").as("s"),
        spanKey(col("sp.g"), stringKeys).as("k"))
      .persist()
    val dfreq = starts.select(col("doc_id"), col("k")).distinct()
      .groupBy(col("k")).agg(count(lit(1)).as("df"))
    val hot = dfreq.filter(col("df") >= minDf).select(col("k"))
    val hotStarts = starts.join(hot, "k").select(col("doc_id"), col("s"))
    // gaps-and-islands: a start opens a new cut iff it begins after the
    // running max end + 1 (overlap OR adjacency merges)
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cuts = hotStarts
      .withColumn("prev_end", max(col("s") + (n - 1)).over(wPrev))
      .withColumn("new_isl",
        when(col("prev_end").isNull || col("s") > col("prev_end") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_isl")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("cut_start"), (max(col("s")) + (n - 1)).as("cut_end"))
    val cutAgg = cuts.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_cuts"),
      sum(col("cut_end") - col("cut_start") + 1).as("tokens_removed"),
      array_sort(collect_list(struct(col("cut_start"), col("cut_end"))))
        .as("cuts"))
      .withColumn("cut_list", array_join(
        transform(col("cuts"),
          c => concat_ws("-", c.getField("cut_start").cast("string"),
            c.getField("cut_end").cast("string"))),
        ";"))
    // the kept filter probes the MERGED CUT INTERVALS, not a
    // materialized per-position cover array (r15, VERDICT r14 next #6):
    // `cov` put every covered position of a doc into one row — a
    // pathological fully-duplicated long doc made a len-sized array —
    // where the interval probe carries O(n_cuts) per row and costs
    // O(n_cuts) per token; cuts are disjoint and sorted by construction
    // (gaps-and-islands), so membership is a plain exists
    // Native one-pass excision (r16): the composed filter(exists(...))
    // ran two nested interpreted lambdas — O(len · n_cuts) frames per
    // doc; the kernel walks tokens and the sorted cuts with one pointer
    // — O(len + n_cuts). [[composedKept]] keeps the semantics reference.
    val out = toked
      .join(cutAgg, Seq("doc_id"), "left")
      .withColumn("kept", bridge(graft.functions.ExciseByIntervals(
        unbridge(col("t")), unbridge(col("cuts")))))
      .select(
        col("doc_id"),
        coalesce(col("n_cuts"), lit(0L)).as("n_cuts"),
        coalesce(col("tokens_removed"), lit(0L)).cast("long").as("tokens_removed"),
        size(col("kept")).cast("long").as("tokens_kept"),
        coalesce(col("cut_list"), lit("")).as("cut_list"),
        array_join(col("kept"), " ").as("cleaned_text"))
    Staged(out, () => { toked.unpersist(); starts.unpersist(); () })
  }

  /** Loan-pattern [[removalWithRelease]] for lexically-scoped use. */
  def removalManaged[U](docs: DataFrame, n: Int = 8, minDf: Long = 2L,
      stringKeys: Boolean = false)(use: DataFrame => U): U = {
    val staged = removalWithRelease(docs, n, minDf, stringKeys)
    try use(staged.frame) finally staged.release()
  }

  /** Raw gate form — persists are released by the registry runner's
    * `clearCache()`; services use the Staged/Managed surface. */
  private[graft] def removal(docs: DataFrame, n: Int = 8, minDf: Long = 2L,
      stringKeys: Boolean = false): DataFrame =
    removalWithRelease(docs, n, minDf, stringKeys).frame
}
