package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Paragraph-level exact dedup with document reconstruction — the
  * MassiveText/Gopher recipe (public: Rae et al., "Scaling Language
  * Models", appendix A1.2): identical paragraphs are removed corpus-wide,
  * keeping only the FIRST occurrence in corpus order, and every document
  * is reassembled from its surviving paragraphs. Distinct from q13 (whole
  * -doc dedup: drops documents) and q84 (hot-SPAN removal: cuts n-gram
  * windows by document frequency): this deduplicates at an intermediate
  * granularity and keeps exactly one copy of each paragraph globally —
  * including within a single document.
  *
  * The synthetic corpus has no '\n\n' structure, so the default splitter
  * chunks the normalized token stream into fixed `chunk`-token paragraphs
  * (last one ragged). On a real corpus the splitter swaps for
  * split(text, '\n\n') without touching the dedup shape — the operator
  * only depends on (doc_id, paragraph_idx, paragraph_text) rows.
  *
  * Distributed shape — two shuffles, never all-pairs:
  *   1. explode docs to paragraph occurrences (map-side);
  *   2. groupBy(paragraph key) → argmin (doc_id, idx): the global
  *      first-occurrence winner per distinct paragraph (one shuffle on
  *      the key; high-cardinality, so no skew — the hottest key's group
  *      is the paragraph's true duplication count);
  *   3. equi-join occurrences with winners, keep the winning occurrence
  *      (broadcast-ineligible but same-key co-partitioned join);
  *   4. groupBy(doc_id) to reassemble (second shuffle).
  *
  * Paragraph keying mirrors [[ExactSubstr]]: by default a 128-bit hash of
  * the paragraph text (16 B through the shuffle/join instead of the ~140 B
  * 20-token string); `stringKeys = true` keys on the text itself, which is
  * what the oracle-gated form runs so the DuckDB comparison is exact by
  * construction.
  *
  * Persist lifecycle: [[Staged]] / loan-pattern managed form, same
  * contract as [[ExactSubstr]] — the occurrence stage feeds both the
  * winner aggregate and the join probe, so it is persisted and must be
  * released after the terminal action.
  */
object ParagraphDedup {

  /** Result frame + explicit release of the operator's staged persists
    * (idempotent; call after the terminal action on `frame`). */
  final case class Staged(frame: DataFrame, release: () => Unit)

  private def hashKey(g: Column): Column =
    struct(xxhash64(lit(1), g).as("h1"), xxhash64(lit(2), g).as("h2"))

  private def paraKey(g: Column, stringKeys: Boolean): Column =
    if (stringKeys) g else hashKey(g)

  /** Global first-occurrence paragraph dedup + reconstruction.
    *
    * Output per input doc: paragraph counts (total / kept / removed),
    * surviving token count, and the reassembled `cleaned_text` (kept
    * paragraphs joined in original order; "" when every paragraph of the
    * doc already occurred earlier in the corpus).
    */
  def dedupWithRelease(docs: DataFrame, chunk: Int = 20,
      stringKeys: Boolean = false): Staged = {
    require(chunk >= 1, s"chunk must be >= 1, got $chunk")
    // one row per paragraph OCCURRENCE: 1-based idx j, text g, token count nt.
    // NULL text coalesces to '' (= one empty token, one empty paragraph):
    // without it size(t) is -1 and ceil(-1/chunk) = 0 makes sequence(1, 0)
    // DESCEND — Spark's sequence infers step -1 — fabricating two phantom
    // paragraphs for the null doc (r11 review)
    val occ = docs
      .select(col("doc_id"), T.tokens(coalesce(col("text"), lit(""))).as("t"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, cast(ceil(size(t) / $chunk.0) as int)), " +
          s"j -> struct(j AS j, concat_ws(' ', slice(t, (j-1)*$chunk + 1, $chunk)) AS g, " +
          s"size(slice(t, (j-1)*$chunk + 1, $chunk)) AS nt))")).as("p"))
      .select(col("doc_id"), col("p.j").as("j"), col("p.g").as("g"),
        col("p.nt").cast("long").as("nt"),
        paraKey(col("p.g"), stringKeys).as("k"))
      .persist()
    // global first occurrence per distinct paragraph: lexicographic
    // argmin over (doc_id, idx) — deterministic, corpus-order "first"
    val winners = occ.groupBy(col("k"))
      .agg(min(struct(col("doc_id"), col("j"))).as("w"))
    val kept = occ.join(winners, "k")
      .filter(col("doc_id") === col("w.doc_id") && col("j") === col("w.j"))
    val keptAgg = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("chunks_kept"),
      sum(col("nt")).as("tokens_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("j"), col("g")))),
          p => p.getField("g")),
        " ").as("cleaned_text"))
    val out = occ.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_chunks"),
        coalesce(col("chunks_kept"), lit(0L)).as("chunks_kept"),
        (col("n_chunks") - coalesce(col("chunks_kept"), lit(0L))).as("chunks_removed"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
    Staged(out, () => { occ.unpersist(); () })
  }

  /** Loan-pattern [[dedupWithRelease]] for lexically-scoped use. */
  def dedupManaged[U](docs: DataFrame, chunk: Int = 20,
      stringKeys: Boolean = false)(use: DataFrame => U): U = {
    val staged = dedupWithRelease(docs, chunk, stringKeys)
    try use(staged.frame) finally staged.release()
  }

  /** Raw gate form — persists are released by the registry runner's
    * `clearCache()`; services use the Staged/Managed surface. */
  private[graft] def dedup(docs: DataFrame, chunk: Int = 20,
      stringKeys: Boolean = false): DataFrame =
    dedupWithRelease(docs, chunk, stringKeys).frame
}
