package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Skew, VectorFunctions => V}

/** Embedding-cosine near-duplicate pairs with scale-safe defaults — the
  * vector-space sibling of MinHash-LSH dedup. Sign-LSH hyperplane
  * buckets block the candidate set, then the exact cosine filters at
  * the threshold. Two knobs decide whether the blocked self-join
  * survives a 100× corpus (FANIN.md findings 2/5):
  *
  *  - **plane count must grow with n**: fixed planes ⇒ fixed bucket
  *    count ⇒ mean bucket size n/2^planes ⇒ candidate pairs O(n²).
  *    [[scaledPlanes]] keeps the MEAN bucket ≈1000 rows
  *    (⌈log₂(n/1000)⌉ planes, +4 for headroom against skew), so
  *    candidates grow ~linearly with n;
  *  - **hot buckets must be capped**: skewed corpora concentrate on a
  *    few buckets whatever the plane count (measured: hottest bucket
  *    8,619 of 200k at 16 planes). [[Skew.capBuckets]] sub-salts any
  *    bucket over `maxBucket` rows, bounding every candidate group at
  *    ~maxBucket² pairs; same-bucket pairs split across sub-buckets are
  *    the documented recall trade.
  *
  * The q24 gate pins `planes = 4` (the DuckDB oracle's fixture config,
  * where every bucket is under the cap so capping is a no-op and the
  * result is bit-identical); production callers pass
  * `planes = scaledPlanes(n)` or let [[pairsAuto]] count the input.
  */
object CosineNearDup {

  /** ⌈log₂(n/1000)⌉ + 4 planes, floor 4 — mean bucket ≈ n/2^planes ≈
    * 60-1000 rows across any n, the size where the blocked self-join's
    * per-group work stays bounded.
    */
  def scaledPlanes(n: Long): Int =
    math.max(4, math.ceil(math.log(math.max(n / 1000.0, 1.0)) / math.log(2)).toInt + 4)

  /** Blocking-key frame (id, bucket, __sub) after capping — the join key
    * distribution that bounds the candidate set; exposed so fan-in
    * harnesses measure exactly the shipped blocking path.
    */
  def blockingKeys(
      embeddings: DataFrame, idCol: String, embCol: String, dim: Int,
      planes: Int, maxBucket: Int = 500): DataFrame = {
    val keyed = embeddings
      .withColumn("e", V.asDouble(col(embCol)))
      .withColumn("bucket", V.hyperplaneBucket(col("e"), planes, dim))
      .select(col(idCol), col("e"), V.norm(col("e")).as("nrm"), col("bucket"))
    Skew.capBuckets(keyed, "bucket", idCol, maxBucket)
  }

  /** All pairs with cosine ≥ `threshold` among same-(bucket, sub) rows.
    * Output: (id_a, id_b, cosine), id_a < id_b. ONE shuffle on the
    * blocking key; candidate count bounded by the capped bucket sizes.
    * The blocking frame is persisted (both sides of the self-join read
    * it); a session that runs MANY corpora through pairs() should
    * `spark.catalog.clearCache()` between them — at 100 TB this frame
    * is a checkpointed signature table, not an in-memory cache.
    */
  def pairs(
      embeddings: DataFrame, idCol: String, embCol: String, dim: Int,
      threshold: Double, planes: Int, maxBucket: Int = 500): DataFrame = {
    val v = blockingKeys(embeddings, idCol, embCol, dim, planes, maxBucket).persist()
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.__sub") === col("b.__sub") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        V.cosine(col("a.e"), col("b.e"), col("a.nrm"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** [[pairs]] with the plane count derived from the input size — the
    * production entry point (one cheap count scan; at 100 TB the corpus
    * row count is catalog metadata).
    */
  def pairsAuto(
      embeddings: DataFrame, idCol: String, embCol: String, dim: Int,
      threshold: Double, maxBucket: Int = 500): DataFrame =
    pairs(embeddings, idCol, embCol, dim, threshold,
      planes = scaledPlanes(embeddings.count()), maxBucket = maxBucket)
}
