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

  /** Fixed-range histogram quantile sketch: `buckets` equi-width bins
    * over [lo, hi) (values clamped to the edge bins), estimate of
    * quantile q = the upper edge of the first bin whose cumulative count
    * reaches q·N. State is `buckets` longs regardless of input, two
    * sketches merge by adding counts, and — unlike GK/t-digest, whose
    * state depends on arrival order — the result is deterministic, so
    * the DuckDB oracle reproduces every bin and every estimate exactly.
    * Error bound: ±(hi−lo)/buckets on the value axis, the documented
    * trade for mergeability + determinism.
    */
  def histogramBins(df: DataFrame, value: Column, lo: Double, hi: Double,
      buckets: Int): DataFrame = {
    require(hi > lo && buckets > 0, "need hi > lo and positive bucket count")
    val width = (hi - lo) / buckets
    df.select(value.cast("double").as("v"))
      // NULLs OUT before binning (r10 review): greatest() SKIPS nulls, so
      // a null value's null bin index silently became bin 0 and inflated
      // it with phantom counts that dragged every quantile toward lo —
      // the same least/greatest-skips-nulls hazard ScalarQuant documents
      .filter(col("v").isNotNull)
      .withColumn("bin",
        least(greatest(floor((col("v") - lit(lo)) / lit(width)), lit(0L)),
          lit(buckets.toLong - 1)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("c"))
  }

  /** Quantile estimates from the bins: for each q, the upper edge of the
    * bin where the cumulative count first reaches ⌈q·N⌉. The finalize
    * step of the mergeable sketch: ONE aggregation collapses the ≤
    * `buckets` bin rows into a single sorted array + total, then each
    * quantile is an O(buckets) fold over that one row — no window (a
    * running-sum window here would be partitionless and serialize
    * through one task, polluting the bench log's single-partition
    * warnings), no join, state bounded by `buckets` regardless of the
    * original input size.
    */
  def histogramQuantiles(bins: DataFrame, lo: Double, hi: Double, buckets: Int,
      qs: Seq[Double]): DataFrame = {
    val width = (hi - lo) / buckets
    val state = bins.agg(
      sort_array(collect_list(struct(col("bin"), col("c")))).as("bins"),
      sum(col("c")).as("total"))
    // first bin (ascending) whose cumulative count reaches ⌈q·total⌉
    def binFor(q: Double): Column = {
      val threshold = ceil(lit(q) * col("total"))
      aggregate(
        col("bins"),
        struct(lit(0L).as("cum"), lit(null).cast("long").as("hit")),
        (acc, x) => struct(
          (acc("cum") + x("c")).as("cum"),
          when(acc("hit").isNull && acc("cum") + x("c") >= threshold, x("bin"))
            .otherwise(acc("hit")).as("hit")),
        acc => acc("hit"))
    }
    def pct(q: Double): Int = (q * 100).toInt
    // truncation collides 0.99/0.999 -> p99/p99: refuse loudly instead of
    // emitting duplicate column names a later col("p99") cannot resolve
    // (r10 review)
    val names = qs.map(q => s"p${pct(q)}")
    require(names.distinct.size == names.size,
      s"quantile labels collide after integer-percent truncation: $names — space the qs")
    state.select(qs.zip(names).map { case (q, n) =>
      (lit(lo) + (binFor(q) + 1) * lit(width)).as(n) }: _*)
  }

  /** KMV estimate of distinct `key` values: with m = the k-th smallest
    * 32-bit key hash, estimate = (k-1) · 2^32 / m; when FEWER than k
    * distinct hashes exist the sketch holds the whole distinct set and
    * the answer is the EXACT count (r10 review: the estimator formula on
    * a partial sketch read ~60x high — 5 distinct keys at k=256 gave
    * ~307 — because the k-th-smallest premise doesn't hold).
    */
  def kmvDistinct(df: DataFrame, key: Column, k: Int): DataFrame =
    df.select(TextFunctions.hash32(key.cast("string")).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("held"))
      .select(
        col("kth_hash"),
        when(col("held") < k, col("held").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / col("kth_hash"))
          .as("estimate"))
}
