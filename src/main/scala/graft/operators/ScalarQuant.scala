package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-range) quantization — the storage-side compression
  * companion to [[PqIndex]]: each dimension is affinely mapped to a
  * code in [0, 255] against per-dimension corpus min/max, 4× smaller
  * than float32 with per-dimension error bounded by half a step. PQ
  * compresses harder (32×) but needs trained books and a lookup-table
  * distance; SQ8 is training-free, decodes to a plain vector, and keeps
  * every distance kernel unchanged — the usual first rung of a vector
  * storage hierarchy (SQ8 at rest → PQ in the index).
  *
  * Determinism: [[stats]] is exact order statistics (min/max per
  * dimension — partial-agg friendly, order-independent), the step is
  * `(max − min) / 256` (an EXACT double operation — division by a
  * power of two only shifts the exponent), and the code is one IEEE
  * division + floor, identical in any engine — which is how DuckDB
  * hash-matches the whole encode (q72).
  *
  * Scale shape: stats is one posexplode → (pos) groupBy with map-side
  * combine (`dims` groups total); the collected per-dimension arrays
  * are driver-side METADATA (2 × dims doubles — the bounded-collect
  * convention), inlined as two literal arrays so encode/decode are pure
  * map stages (no join, no shuffle, whole-stage codegen).
  */
object ScalarQuant {

  /** Per-dimension (min, max) over the corpus: `(pos, lo, hi)`, one row
    * per dimension, 0-based pos.
    */
  def stats(vectors: DataFrame, embCol: String): DataFrame =
    vectors.select(posexplode(col(embCol)).as(Seq("pos", "x")))
      .filter(col("x").isNotNull)
      .groupBy(col("pos"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))

  /** Collected stats as (lo[], step[]) arrays in dimension order —
    * driver-side metadata, `dims`-bounded. A degenerate dimension
    * (hi == lo) gets step 0 and always codes to 0.
    */
  def ranges(vectors: DataFrame, embCol: String): (Seq[Double], Seq[Double]) = {
    val byPos = stats(vectors, embCol).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // densify by position: an ALL-null dimension has no stats row, and a
    // positional gap would silently shift every later dimension's range
    // — give it (0, 0) instead (its elements are null and code to null
    // anyway)
    val dims = if (byPos.isEmpty) 0 else byPos.keys.max + 1
    ((0 until dims).map(p => byPos.get(p).fold(0.0)(_._1)),
      (0 until dims).map(p => byPos.get(p).fold(0.0) { case (lo, hi) => (hi - lo) / 256.0 }))
  }

  /** Quantize `e` to codes 0…255 per dimension against (lo, step). Pure
    * map — the literal arrays ride the plan, no join. Clamped at BOTH
    * ends: `x == hi` lands on 256 and is clamped to 255, and a value
    * below `lo` (a QUERY vector encoded against stats trained on a
    * different corpus — stats-corpus values cannot underflow by
    * construction) clamps to 0 instead of going negative (r10 review:
    * an unclamped negative code broke the documented 0…255 contract,
    * and element_at(table, code+1) on a negative silently indexes from
    * the END of the lookup array). A null element yields a NULL code
    * (checked first — `least`/`greatest` skip nulls, so without the
    * guard a null would silently code 255).
    */
  def encodeExpr(e: Column, lo: Seq[Double], step: Seq[Double]): Column = {
    val loA = typedlit(lo)
    val stA = typedlit(step)
    transform(e, (x, i) =>
      when(x.isNull, lit(null).cast("long"))
        .when(element_at(stA, i + 1) === 0.0, lit(0L))
        .otherwise(least(lit(255L), greatest(lit(0L),
          floor((x - element_at(loA, i + 1)) / element_at(stA, i + 1))))))
  }

  /** Reconstruct the vector midpoint from codes: `lo + (code + 0.5) ·
    * step` — per-dimension error ≤ step/2 by construction. Oracle-gated
    * end to end by q75 (SQ8 at rest → decoded-cosine shortlist → exact
    * re-rank).
    */
  def decodeExpr(codes: Column, lo: Seq[Double], step: Seq[Double]): Column = {
    val loA = typedlit(lo)
    val stA = typedlit(step)
    transform(codes, (c, i) =>
      element_at(loA, i + 1) +
        (c.cast("double") + lit(0.5)) * element_at(stA, i + 1))
  }

  /** Corpus-level encode: `idCol`, `codes` (array<long> 0…255). */
  def encode(vectors: DataFrame, embCol: String, idCol: String): DataFrame = {
    val (lo, step) = ranges(vectors, embCol)
    vectors.select(col(idCol), encodeExpr(col(embCol), lo, step).as("codes"))
  }
}
