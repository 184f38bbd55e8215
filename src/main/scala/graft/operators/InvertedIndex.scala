package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical similarity over a document-frequency-capped inverted
  * index — the classic IR route to "which documents share rare
  * vocabulary", as a third pairwise family next to set overlap
  * (MinHash/LSH, q15) and edit distance (banded Levenshtein, q57):
  * pairs meet through the POSTING LIST of each shared term and score by
  * idf-weighted term-frequency products, so common terms neither cost
  * nor count.
  *
  * Scale lever (the public impact-pruning recipe): a term with document
  * frequency df contributes df·(df−1)/2 candidate pairs, so the join
  * fan-in is Σ df² over surviving terms — unbounded exactly when
  * Zipf-head terms survive. Capping df ≤ dfCap bounds every posting
  * list, giving fan-in ≤ dfCap·|postings|, linear in corpus size at a
  * fixed cap; the dropped head terms are precisely the ones whose idf
  * weight ~ scale/df rounds toward zero, so the cap removes the
  * EXPENSIVE terms that were barely scoring (at the sf0.01 gate corpus
  * the cap is a measured 36× candidate reduction). The same argument
  * q15 makes with band keys and q91 with cells, here with df.
  *
  * Weights are exact fixed-point (the Mixture/q90/q92 discipline):
  * idf ∝ N/df and N is constant across a corpus, so ranking is
  * invariant to it — the shipped weight is `scale div df`, which keeps
  * every product inside Long at ANY corpus size (no N factor to grow
  * with the crawl) and lets DuckDB reproduce each score digit-for-digit.
  */
object InvertedIndex {

  /** Result frame + explicit release of the operator's staged persists
    * (idempotent; call after the terminal action on `frame`) — the
    * ExactSubstr/SemDeDup contract. */
  final case class Staged(frame: DataFrame, release: () => Unit)

  /** df-capped postings `(idCol, tokCol, tf, df)`: per-document term
    * frequencies joined with term document frequencies, terms with
    * df > dfCap dropped before any pairing.
    *
    * @param docTokens one row per term OCCURRENCE (`idCol`, `tokCol`)
    */
  def postings(docTokens: DataFrame, idCol: String, tokCol: String,
      dfCap: Long): DataFrame = {
    require(dfCap >= 2, s"dfCap below 2 can produce no pairs, got $dfCap")
    val tf = docTokens.groupBy(col(idCol), col(tokCol)).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col(tokCol)).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    tf.join(df, Seq(tokCol))
  }

  /** Pair scores over capped postings: for each unordered pair (a < b)
    * score = Σ over shared terms of `tf_a · tf_b · (scale div df)`.
    * One self-equi-join on the term — the pair space never materializes
    * beyond the posting-list products the cap already bounds.
    */
  def pairScores(postings: DataFrame, idCol: String, tokCol: String,
      scale: Long): DataFrame = {
    require(scale >= 1, s"scale must be positive, got $scale")
    val a = postings.select(col(tokCol), col(idCol).as("doc_a"),
      col("tf").as("tf_a"), col("df"))
    val b = postings.select(col(tokCol), col(idCol).as("doc_b"), col("tf").as("tf_b"))
    a.join(b, Seq(tokCol))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("tf_a") * col("tf_b") * expr(s"$scale div df")).as("score"))
  }

  /** [[postings]] + [[pairScores]] composed with the postings stage
    * PERSISTED: both sides of the self-join consume it and the df
    * branch's exchange embeds a partial aggregate, so ReuseExchange
    * cannot unify the two scans — without the persist the tf/df
    * pipeline executes twice (the ExactSubstr span-stage argument).
    * Returns [[Staged]]; release after the terminal action.
    */
  def pairsWithRelease(docTokens: DataFrame, idCol: String, tokCol: String,
      dfCap: Long, scale: Long): Staged = {
    val post = postings(docTokens, idCol, tokCol, dfCap).persist()
    Staged(pairScores(post, idCol, tokCol, scale), () => { post.unpersist(); () })
  }

  /** Loan-pattern [[pairsWithRelease]] for lexically-scoped use. */
  def pairsManaged[U](docTokens: DataFrame, idCol: String, tokCol: String,
      dfCap: Long, scale: Long)(use: DataFrame => U): U = {
    val staged = pairsWithRelease(docTokens, idCol, tokCol, dfCap, scale)
    try use(staged.frame) finally staged.release()
  }

  /** Raw gate form — persists are released by the registry runner's
    * `clearCache()`; services use the Staged/Managed surface. */
  private[graft] def pairs(docTokens: DataFrame, idCol: String, tokCol: String,
      dfCap: Long, scale: Long): DataFrame =
    pairsWithRelease(docTokens, idCol, tokCol, dfCap, scale).frame
}
