package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Explicit two-stage per-key top-k — the skew-safe decomposition of
  * `row_number() OVER (PARTITION BY key ORDER BY o) <= k` (r13, VERDICT
  * wrong #1): any row in the global top-k of its key is also in the
  * top-k of ANY subset containing it, so
  *
  *   1. salt each row with a deterministic `pmod(saltExpr, salts)` and
  *      take the top-k per (key, salt) — a hot key's sort spreads
  *      over `salts` tasks, each emitting at most k candidates;
  *   2. re-rank the ≤ salts·k survivors per key — a window whose input
  *      is CANDIDATE-sized (bounded by salts·k per key, never corpus-
  *      sized), so its single-task-per-key physical shape is harmless.
  *
  * Stage 2's row_number over the candidates below k equals the global
  * rank exactly (every global top-k row survives stage 1, and ranks
  * only count rows ordered before you). The order must be a TOTAL
  * order (tie-broken) for ranks to be reproducible.
  *
  * **Prefer the naive rank-filter window where it applies**: Catalyst's
  * `InferWindowGroupLimit` (Spark 3.5+) rewrites `filter(rank <= k)`
  * adjacent to a row_number/rank/dense_rank window into a map-side
  * `WindowGroupLimit(Partial)` + shuffle + `Final` — the same
  * candidate bound as stage 1 without the salt column (measured parity
  * on an 80%-one-source corpus, FANIN.md r13; q60 ships the naive form
  * with the rewrite plan-pinned). This operator is for rank windows
  * the rewrite can NOT reach — a rank consumed beyond a single
  * adjacent `<= k` filter (joins on rank, mixed predicates), or a
  * per-key k injected by join rather than a literal — where the
  * optimizer falls back to the one-task-per-stratum window.
  */
object TopK {

  /** `df` filtered to the top `k` rows per `keys` in `order`, plus
    * `rankName` = the 1-based rank (long).
    *
    * @param saltExpr deterministic integral expression (e.g.
    *                 `xxhash64($"doc_id")`) — salting must be stable
    *                 across retries or speculative tasks would rank
    *                 different candidate sets.
    */
  def perKey(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Column],
      k: Int,
      rankName: String,
      saltExpr: Column,
      salts: Int = 32): DataFrame = {
    require(keys.nonEmpty, "perKey needs at least one partition key")
    require(k >= 1, s"k must be positive, got $k")
    require(salts >= 1, s"salts must be positive, got $salts")
    val reserved = Seq("__tks", "__tkr", rankName)
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"top-k scratch columns collide with input columns: ${clash.mkString(", ")}")
    val keyCols = keys.map(col)
    val w1 = Window.partitionBy(keyCols :+ col("__tks"): _*).orderBy(order: _*)
    val candidates = df
      .withColumn("__tks", pmod(saltExpr, lit(salts.toLong)))
      .withColumn("__tkr", row_number().over(w1))
      .filter(col("__tkr") <= k)
    val w2 = Window.partitionBy(keyCols: _*).orderBy(order: _*)
    candidates
      .withColumn(rankName, row_number().over(w2).cast("long"))
      .filter(col(rankName) <= k)
      .select(df.columns.map(col) :+ col(rankName): _*)
  }
}
