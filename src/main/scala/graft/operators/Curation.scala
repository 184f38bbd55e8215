package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** The curation-stage bodies behind the q79/q80/q86 gates AND the
  * PIPELINE workflow steps ([[graft.steps.Transforms]]) — ONE
  * implementation per stage, so the orchestration surface executes
  * literally the same Spark plans the oracle-gated registry proves
  * (r12: the q103 workflow gate runs these as `Steps` under
  * `WorkflowRunner`; a second inline copy in either place would be the
  * drift the gates exist to exclude).
  *
  * Stages (public recipes — Rae et al. 2021 MassiveText filtering, the
  * benchmark-decontamination practice of GPT-3/PaLM appendices, Lee et
  * al. 2022 ExactSubstr, temperature-scaled mixtures):
  *
  *   - [[decontaminate]]: n-gram overlap against an eval holdout slice,
  *     broadcast eval-gram join (eval suites are bounded; the corpus
  *     side never shuffles for it).
  *   - [[repetitionStats]]: the Gopher repetition rules as a pure map —
  *     one corpus scan, zero shuffle, per-doc sorted-runs fold.
  *   - [[survivors]]: compose stage verdicts by left-semi joins.
  *   - [[spanCleanedWithRelease]]: corpus-hot span removal
  *     ([[ExactSubstr.removal]]) over the survivor set, survivor frame
  *     staged (it feeds removal AND the metadata join back).
  *   - [[mixtureBudgetWithRelease]]: temperature-scaled language rates
  *     (exact BigInt algebra on a cardinality-capped collected stat,
  *     [[Mixture.rates]]) + per-source token-budget prefix take.
  */
object Curation {

  /** Result frame + explicit release of the stage's persists
    * (idempotent; call after the terminal action on `frame`) — the
    * ExactSubstr/SemDeDup/Dsir contract. */
  final case class Staged(frame: DataFrame, release: () => Unit)

  /** Benchmark decontamination (the q79 body): hash every distinct
    * 4-token shingle, take the `doc_id % 10 == holdoutSlice` docs as
    * the eval suite, and count each remaining doc's shared grams.
    * Output (doc_id, shared_grams, contaminated) over non-holdout docs.
    */
  def decontaminate(docs: DataFrame, holdoutSlice: Long): DataFrame = {
    require(holdoutSlice >= 0 && holdoutSlice < 10,
      s"holdout slice must be a mod-10 residue, got $holdoutSlice")
    val toks = docs.select(col("doc_id"), T.tokens(col("text")).as("t"))
    val grams = toks
      .select(col("doc_id"), explode(T.shingles("t", 4)).as("gram"))
      .select(col("doc_id"), T.hash32(col("gram")).as("gh"))
    val evalGrams = grams.filter(col("doc_id") % 10 === holdoutSlice)
      .select(col("gh")).distinct()
    val hits = grams.filter(col("doc_id") % 10 =!= holdoutSlice)
      .join(broadcast(evalGrams), "gh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("shared_grams"))
    toks.filter(col("doc_id") % 10 =!= holdoutSlice).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("shared_grams"), lit(0L)).as("shared_grams"),
        (coalesce(col("shared_grams"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  /** Repetition-based quality stats (the q80 body): per doc,
    * `dup_token_frac` = 1 − distinct/total tokens, the most frequent
    * bigram via the sorted-runs fold (O(len·log len); strict `>` keeps
    * the lexicographically-smallest gram on ties, the relational
    * `ORDER BY c DESC, g` verdict), and the keep flag at
    * dup ≤ 0.65 ∧ top ≤ 0.08. Pure map — one corpus scan, no shuffle.
    */
  def repetitionStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), T.tokens(col("text")).as("t"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("dup_token_frac",
        when(col("n_tokens") > 0,
          lit(1.0) - size(array_distinct(col("t"))).cast("double") /
            col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      // one native pass: bigrams + sort + sorted-runs max (r15 —
      // previously an interpreted lambda per bigram plus a named_struct
      // allocation per fold step; see TextFunctions.bigramRunTop)
      .withColumn("top", T.bigramRunTop(col("t")))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        when(col("top.n_bg") > 0, col("top.g")).otherwise(lit("")).as("top_bigram"),
        when(col("top.n_bg") > 0, col("top.c").cast("double") / col("top.n_bg").cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_frac"),
        ((col("dup_token_frac") <= 0.65) &&
          when(col("top.n_bg") > 0, col("top.c").cast("double") / col("top.n_bg").cast("double"))
            .otherwise(lit(0.0)) <= 0.08).cast("int").as("keep_doc"))

  /** Docs surviving both verdict id-sets — two left-semi joins (never a
    * column-carrying join: the verdict frames may carry audit columns
    * when they come back from a warehouse table). */
  def survivors(docs: DataFrame, cleanIds: DataFrame, keepIds: DataFrame): DataFrame =
    docs
      .join(cleanIds.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .join(keepIds.select(col("doc_id")), Seq("doc_id"), "left_semi")

  /** Corpus-hot span removal over the survivor set (the q86 span
    * stage): [[ExactSubstr.removal]] with the survivor frame STAGED —
    * it feeds the span pipeline and the (lang, source) metadata join
    * back, and filtering on computed columns downstream would otherwise
    * re-inline the removal's higher-order lambdas per consumer (the
    * 10.8 s → 0.75 s CSE-barrier measurement in the q86 doc).
    * Output (doc_id, toks_clean, cleaned_text, lang, source); docs
    * whose every token sat in a hot span drop out (tokens_kept = 0).
    */
  def spanCleanedWithRelease(survivorDocs: DataFrame, n: Int = 8,
      stringKeys: Boolean = true): Staged = {
    val surv = survivorDocs.persist()
    val removal = ExactSubstr.removalWithRelease(surv, n = n, stringKeys = stringKeys)
    val cleaned = removal.frame
      .filter(col("tokens_kept") > 0)
      .select(col("doc_id"), col("tokens_kept").as("toks_clean"), col("cleaned_text"))
      .join(surv.select(col("doc_id"), col("lang"), col("source")), "doc_id")
    Staged(cleaned, () => { removal.release(); surv.unpersist(); () })
  }

  /** Temperature-scaled mixture rates + per-source token-budget prefix
    * take (the q86 tail): collect the cardinality-capped language
    * stats (a dims-bounded collect with a loud `require`, NOT a
    * data-path collect), compute exact per-lang base/threshold in
    * BigInt ([[Mixture.rates]]), score cleaned text, and admit docs per
    * source in descending quality order until the token budget is
    * spent. Input is STAGED (the lang-stats collect and the final join
    * both consume it). Output (doc_id, lang, source, toks_clean,
    * n_repeats, cum_tokens).
    */
  def mixtureBudgetWithRelease(cleaned: DataFrame, epochDocs: Long, budget: Long,
      maxLangs: Int = 65536): Staged = {
    val sp = cleaned.sparkSession
    import sp.implicits._
    val c = cleaned.persist()
    val langStats = c.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .limit(maxLangs + 1).collect()
    require(langStats.length <= maxLangs,
      s"curation: language cardinality exceeds $maxLangs — not a lang column?")
    val rates = Mixture
      .rates(langStats.toSeq.map(r => (r.getString(0), r.getLong(1))), epochDocs)
      .toDF("lang", "base", "thresh")
    // the budget take runs through the skew-safe two-pass prefix sum
    // (r13, VERDICT wrong #1): the bare per-source unbounded window is a
    // one-task-per-stratum sort — fatal on a Zipf corpus. The prefix
    // input is projected down to the scoring/accounting columns first
    // (q is computed here; cleaned_text never enters the staged frame),
    // and offsetCap prunes buckets that can no longer fit the budget.
    val scored = c.join(broadcast(rates), "lang")
      .withColumn("q", T.qualityScore(col("cleaned_text")))
      .select(col("doc_id"), col("lang"), col("source"), col("toks_clean"),
        col("base"), col("thresh"), col("q"))
    // the bucket count stays FIXED (not derived from the lang-stats
    // row count): a data-dependent numBuckets=1 lets Catalyst fold the
    // constant bucket column out of the window's partition spec and
    // the plan silently degrades to the one-task-per-stratum shape the
    // PlanAuditSpec pin exists to forbid — the sketch pass + join are
    // ~1 s of fixed cost at toy scale (FANIN r13 sidecar note), priced
    // against the 12× hot-task collapse the spread buys under Zipf
    val prefixed = PrefixSum.perKeyWithRelease(scored, Seq("source"),
      order = Seq(col("q").desc, col("doc_id")), orderHead = col("q"),
      descending = true, value = col("toks_clean"), cumName = "cum_tokens",
      offsetCap = Some(budget))
    val out = prefixed.frame
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("lang"), col("source"), col("toks_clean"),
        (col("base") +
          when(pmod(T.hash32(col("doc_id").cast("string")), lit(1000L)) < col("thresh"),
            1L).otherwise(0L))
          .cast("long").as("n_repeats"),
        col("cum_tokens"))
    Staged(out, () => { prefixed.release(); c.unpersist(); () })
  }
}
