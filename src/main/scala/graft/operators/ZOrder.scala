package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-interleaved (Morton / Z-order) sort keys for multi-dimensional
  * data LAYOUT — the public lakehouse recipe (Delta `OPTIMIZE ZORDER`,
  * Iceberg sort orders, the 1966 Morton curve) for making one physical
  * sort serve range pruning on SEVERAL columns at once: interleaving
  * the bits of k columns means records close in z-key are close in
  * every dimension, so writing files in z-key order gives each file a
  * tight min/max envelope on every interleaved column and the scan
  * planner can skip files for predicates on ANY of them. At 100 TB
  * this is the difference between "partition by one column, full-scan
  * for filters on the others" and "one layout, k prunable columns";
  * the key itself is a pure map of codegen'd bit ops — no shuffle, no
  * UDF — and the layout action is `repartitionByRange(zkey)` +
  * ordered write, never a global window.
  *
  * No reference counterpart (the reference's T-SQL relies on the
  * database's clustered indexes); this is the Spark-side equivalent a
  * parquet lake needs.
  */
object ZOrder {

  /** The z-key: bit `i` of column `j` lands at output bit `i*k + j`
    * (column 0 in the low bit of each group of k). Inputs are cast to
    * long and masked to their low `bits` bits, so callers quantize —
    * production keys quantize high-cardinality columns to rank buckets
    * first (the Delta recipe); `k * bits` must stay under the sign bit.
    */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1, "interleave needs at least one column")
    require(bits >= 1 && k * bits <= 63, s"k*bits must be in [1,63], got ${k * bits}")
    val mask = (1L << bits) - 1
    val masked = cols.map(_.cast("long").bitwiseAND(lit(mask)))
    (for { i <- 0 until bits; (c, j) <- masked.zipWithIndex }
      yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_ bitwiseOR _)
  }

  /** Driver-side reference decode (test oracle): column `j`'s value
    * from a z-key produced by [[interleave]] over k columns.
    */
  def deinterleave(z: Long, k: Int, bits: Int, j: Int): Long =
    (0 until bits).map(i => ((z >> (i * k + j)) & 1L) << i).reduce(_ | _)
}
