package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Training-set ASSEMBLY stages — the tail of the LLM data pipeline
  * after curation/selection: take a per-source token budget, split
  * train/val/test, pack sequences. One implementation behind the
  * q59/q61/q82 gates AND the PIPELINE workflow steps
  * ([[graft.steps.Transforms]]) — the [[Curation]] no-drift discipline
  * (an inline second copy in either place is exactly the drift the
  * gates exist to exclude; q113 chains these as steps under the full
  * orchestrator against a composed oracle).
  *
  * Scale stance: the per-source cumulative frames go through
  * [[PrefixSum.perKey]] (two-pass bucketed prefix sums — a Zipf-hot
  * source spreads over the bucket count instead of serializing into
  * one task, FANIN.md r13); the split is a pure map; nothing here
  * shuffles more than once per stage.
  */
object Assembly {

  /** Deterministic 80/10/10 split (the q59 body): a pure map of the
    * id's 32-bit hash — reproducible across engines, reruns, and
    * partitionings; no shuffle at all. Output (idCol, source, split).
    */
  def hashSplit(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val h = pmod(T.hash32(col(idCol).cast("string")), lit(100L))
    docs.select(col(idCol), col("source"),
      when(h < 80, "train").when(h < 90, "val").otherwise("test").as("split"))
  }

  /** Per-source token-budget take (the q82 body): rank each source's
    * docs by quality (ties on doc_id — total order), take the prefix
    * whose running token sum stays within `budget`. The running sum is
    * the skew-safe two-pass form with the budget pushed into the
    * bucket prune (`offsetCap` — buckets past the budget are dropped
    * before the window touches them). Output
    * (doc_id, source, toks, cum_tokens), admitted rows only.
    */
  def budgetTakeWithRelease(docs: DataFrame, budget: Long): Curation.Staged = {
    require(budget >= 1, s"budget must be positive, got $budget")
    val scored = docs.select(col("doc_id"), col("source"),
      T.tokenCount(col("text")).as("toks"), T.qualityScore(col("text")).as("q"))
    val staged = PrefixSum.perKeyWithRelease(scored, Seq("source"),
      order = Seq(col("q").desc, col("doc_id")), orderHead = col("q"),
      descending = true, value = col("toks"), cumName = "cum_tokens",
      offsetCap = Some(budget))
    Curation.Staged(
      staged.frame.filter(col("cum_tokens") <= budget)
        .select(col("doc_id"), col("source"), col("toks"), col("cum_tokens")),
      staged.release)
  }

  /** Token-budget sequence packing (the q61 body): per source, docs in
    * stable doc_id order pack greedily into `packTokens`-token
    * sequences — a doc belongs to the pack its FIRST token lands in,
    * a pure function of the ordered prefix sums (reproducible across
    * engines and reruns). Integral division throughout (`div`, not
    * `/` — long-over-double rounds past 2^53). Output
    * (doc_id, source, n_tokens, pack_id).
    */
  def tokenPackWithRelease(docs: DataFrame, packTokens: Long = 4096L): Curation.Staged = {
    require(packTokens >= 1, s"packTokens must be positive, got $packTokens")
    val toks = docs.select(col("doc_id"), col("source"),
      T.tokenCount(col("text")).as("n_tokens"))
    val staged = PrefixSum.perKeyWithRelease(toks, Seq("source"),
      order = Seq(col("doc_id")), orderHead = col("doc_id"),
      descending = false, value = col("n_tokens"), cumName = "cum")
    Curation.Staged(
      staged.frame.select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"(cum - n_tokens) div ${packTokens}L").as("pack_id")),
      staged.release)
  }

  /** Deterministic training-shard shuffle (the stage AFTER packing —
    * the last assembly step before files hit the trainer): scatter the
    * packed sequences across `nShards` output shards in a
    * pseudo-random but fully REPRODUCIBLE order. SGD wants the corpus
    * order decorrelated from its construction order (source runs,
    * pack-id runs); reproducibility wants the permutation to be a pure
    * function of the data, not of `rand()` or the partitioning. Both
    * come from hashing the pack key: `shard = hash32(source:pack_id)
    * mod nShards`, and within a shard packs order by (hash, source,
    * pack_id) — the hash scatters, the key breaks 32-bit collisions
    * totally, so the layout is identical across engines, reruns, and
    * cluster sizes. All docs of a pack land in the same shard,
    * contiguous at the pack's `shard_pos`.
    *
    * Scale stance: the position window runs over the PACKS frame (one
    * row per pack — corpus rows / pack size) partitioned by `shard`,
    * and shard occupancy is hash-UNIFORM by construction — no Zipf
    * stratum can serialize into one task the way a `source` partition
    * can (the r13 PrefixSum finding); `nShards` is picked to make one
    * shard one trainer-file-sized unit, which bounds the per-task sort
    * independent of corpus skew. The join back to doc rows is one
    * co-partitioned hash shuffle on the pack key.
    *
    * Input: a [[tokenPackWithRelease]]-shaped frame
    * (`doc_id, source, n_tokens, pack_id`). Output: the same plus
    * (`shard`, `shard_pos`).
    */
  def shardShuffle(packed: DataFrame, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val packKey = concat_ws(":", col("source"), col("pack_id"))
    val packs = packed.select(col("source"), col("pack_id")).distinct()
      .withColumn("__sh", T.hash32(packKey))
      .withColumn("shard", pmod(col("__sh"), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__sh"), col("source"), col("pack_id"))
    val placed = packs
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1L)
      .select(col("source"), col("pack_id"), col("shard"), col("shard_pos"))
    packed.join(placed, Seq("source", "pack_id"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("pack_id"),
        col("shard"), col("shard_pos"))
  }

  /** The WRITE action [[shardShuffle]] exists for: materialize the
    * sharded corpus as one directory per shard
    * (`path/shard=K/part-*.parquet`), each shard's rows sorted by
    * (shard_pos, doc_id) so a trainer streaming a shard's files in
    * name order reads packs in their shuffled order. One
    * `repartition(nShards, shard)` hash shuffle + per-partition sort —
    * no global sort, no single-task sink; `shard_pos` stays in the
    * schema so the order is re-derivable even where a reader's file
    * ordering isn't trusted.
    */
  def writeShards(sharded: DataFrame, path: String): Unit =
    sharded
      .repartition(sharded.col("shard"))
      .sortWithinPartitions("shard", "shard_pos", "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Raw gate forms — persists are released by the registry runner's
    * `clearCache()`; services use the Staged surface. */
  private[graft] def budgetTake(docs: DataFrame, budget: Long): DataFrame =
    budgetTakeWithRelease(docs, budget).frame
  private[graft] def tokenPack(docs: DataFrame, packTokens: Long = 4096L): DataFrame =
    tokenPackWithRelease(docs, packTokens).frame
}
