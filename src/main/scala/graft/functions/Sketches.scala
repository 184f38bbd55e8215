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

  /** Count-Min sketch estimates for every distinct `key`: `depth`
    * affine hash rows over `width` counters (same md5-derived family as
    * the minhash, so DuckDB reproduces every bucket), estimate = min
    * over rows of the landed counter. The counter table is
    * depth×width longs however large the input — the mergeable
    * frequency summary for heavy-hitter profiling; over-estimates only
    * (collision bias), never under.
    */
  def countMinEstimates(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    val hashed = df.select(key.cast("string").as("key_s"))
      .withColumn("h", TextFunctions.hash32(col("key_s")))
    val withBuckets = hashed.withColumn("jb",
      explode(array((0 until depth).map { j =>
        struct(lit(j).as("j"),
          ((lit(2L * j + 1) * col("h") + lit(j * TextFunctions.MinhashB)) %
            lit(TextFunctions.MinhashMod) % lit(width.toLong)).as("b"))
      }: _*)))
    val counters = withBuckets
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val keyBuckets = withBuckets
      .select(col("key_s"), col("jb.j").as("j"), col("jb.b").as("b"))
      .distinct()
    keyBuckets.join(counters, Seq("j", "b"))
      .groupBy(col("key_s"))
      .agg(min(col("c")).as("est"))
  }

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
