package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback for the hot-key
  * cases AQE's skew-join handling does not cover (aggregations, and
  * joins below the skew-split thresholds). Results are provably
  * identical to the unsalted plan; only the shuffle distribution
  * changes.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on
    * (keys, salt ∈ [0, buckets)) so a hot key spreads over `buckets`
    * reducers; phase 2 merges the partials per key. Caller provides the
    * per-phase aggregate pairs (partial, merge) — e.g. (sum, sum),
    * (count, sum).
    *
    * The salt derives from a hash of `saltSource` (any column with
    * per-row variance, e.g. the value column) — deterministic, no rand().
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      partial: Seq[(String, Column => Column)],
      merge: Seq[(String, Column => Column)],
      saltSource: Column): DataFrame = {
    require(partial.map(_._1) == merge.map(_._1), "partial/merge column names must align")
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets.toLong)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head._2(col(partial.head._1)).as(partial.head._1),
        partial.tail.map(p => p._2(col(p._1)).as(p._1)): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head._2(col(merge.head._1)).as(merge.head._1),
        merge.tail.map(m => m._2(col(m._1)).as(m._1)): _*)
  }

  /** Cap hot blocking buckets by sub-salting — the FANIN.md finding-5
    * mitigation for LSH/IVF candidate joins: buckets whose row count
    * exceeds `maxBucket` are split into ⌈size/maxBucket⌉ sub-buckets by
    * a deterministic hash of `idCol`, so a self-join on
    * (bucket, sub) bounds every candidate set at ~maxBucket² instead of
    * hot-bucket². Pairs that land in different sub-buckets of the same
    * hot bucket are the (bounded, documented) recall cost — the standard
    * candidate-cap trade. Two linear passes: a bucket-size aggregation
    * (tiny — one row per bucket) broadcast back onto the rows, then the
    * salt map.
    */
  def capBuckets(
      df: DataFrame,
      bucketCol: String,
      idCol: String,
      maxBucket: Int): DataFrame = {
    require(maxBucket > 0, "maxBucket must be positive")
    // broadcast only the OVER-cap buckets: for high-cardinality blocking
    // keys (fine LSH bands, mostly-singleton buckets) the full size table
    // is as big as the data and would blow the broadcast limit — the hot
    // set is small by definition, and an absent key means 1 split
    val hot = df.groupBy(col(bucketCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
    df.join(broadcast(hot), Seq(bucketCol), "left")
      .withColumn("__splits",
        coalesce(ceil(col("__n").cast("double") / maxBucket).cast("long"), lit(1L)))
      .withColumn("__sub", pmod(xxhash64(col(idCol)), col("__splits")))
      .drop("__n", "__splits")
  }

  /** Salted broadcast-free join for one known-hot build side: the big
    * (probe) side gets a deterministic salt, the small side is
    * replicated once per bucket, and the join key becomes (key, salt) —
    * a hot key's rows land on `buckets` reducers instead of one.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      keys: Seq[String], buckets: Int, saltSource: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
