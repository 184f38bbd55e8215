package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives for similarity search, composed from
  * codegen'd higher-order built-ins (`transform`/`zip_with`/`aggregate`)
  * — no UDFs, so the hot path stays inside whole-stage codegen and the
  * arithmetic is a strict left fold both here and in the DuckDB oracle
  * (`list_reduce`), giving bit-identical doubles.
  *
  * Scale design: cosine scoring is embarrassingly parallel (narrow maps);
  * the quadratic part of similarity search is the candidate join, which
  * [[hyperplaneBucket]] bounds by LSH-bucketing so the join key is the
  * bucket, never a cartesian. Cf. the reference's delegation of all
  * "real" compute to backends (`/root/reference` SURVEY §2.5) — vectors
  * are where our engine adds capability the reference lacks.
  */
object VectorFunctions {

  /** float[] → double[] (exact widening) so all downstream arithmetic is
    * double-precision in a deterministic order.
    */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Strict left-fold dot product: ((0 + x1*y1) + x2*y2) + … — the same
    * association DuckDB's list_reduce(list_prepend(0.0, …)) performs.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity of two double arrays: dot / (||a|| * ||b||). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component d of
    * plane j is ((md5-hash32 of "j,d") % 2001 - 1000) / 1000 ∈ [-1, 1].
    * Derived from md5 so the DuckDB oracle can regenerate the identical
    * planes with pure SQL (no shipped constants to drift).
    */
  def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { j =>
      (0 until dim).map(d => (hash32(s"$j,$d") % 2001 - 1000) / 1000.0)
    }

  /** Driver-side twin of TextFunctions.hash32 (first 8 md5 hex chars as a
    * non-negative long) for constant-folding plane weights at plan build.
    */
  def hash32(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Sign-LSH bucket id: bit j set iff dot(plane_j, v) > 0. With p planes
    * vectors land in 2^p buckets; cosine-similar vectors collide with high
    * probability, so the ANN candidate join runs per-bucket instead of
    * all-pairs — the 100 TB scale path (bucket count tunes the
    * recall/fan-in trade-off; at cluster scale you also repartition by
    * bucket so each candidate set is node-local).
    */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val ps = planes(nPlanes, dim)
    (0 until nPlanes)
      .map(j => when(dot(v, typedlit(ps(j))) > 0.0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
  }
}
