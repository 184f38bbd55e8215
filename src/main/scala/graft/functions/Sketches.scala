package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches. HLL (`approx_count_distinct`)
  * is implementation-specific and unverifiable across engines; KMV
  * (k-minimum-values) over the engine's md5-derived hash is exactly
  * reproducible anywhere, which makes the sketch itself
  * oracle-checkable — the estimator the run ledger can safely record.
  *
  * Scale shape: distinct-hash → top-k ascending is a `TakeOrdered`
  * (per-partition k-selection + merge of k-element heaps), never a
  * global sort; the sketch state is k longs regardless of input size,
  * and two sketches union by merging their value sets — the mergeable
  * summary a 1000-executor rollup needs.
  */
object Sketches {

  /** KMV estimate of distinct `key` values: with m = the k-th smallest
    * 32-bit key hash, estimate = (k-1) · 2^32 / m.
    */
  def kmvDistinct(df: DataFrame, key: Column, k: Int): DataFrame =
    df.select(TextFunctions.hash32(key.cast("string")).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
      .agg(max(col("h")).as("kth_hash"))
      .select(
        col("kth_hash"),
        (lit((k - 1).toDouble) * lit(4294967296.0) / col("kth_hash")).as("estimate"))
}
