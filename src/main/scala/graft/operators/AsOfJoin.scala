package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the most recent right row
  * with `right.ts <= left.ts` within the same key. Spark has no native
  * as-of operator (the reference delegates everything to backend SQL,
  * SURVEY §2.5); this composes one from a union + running `last(…,
  * ignoreNulls)` window:
  *
  *  1. tag right rows 0, left rows 1, union by key/ts + carried value
  *     columns (right-only, null on left rows);
  *  2. one window per key ordered by (ts, tag, right row order): a
  *     running last-non-null of each carried column gives every left
  *     row the latest right values at-or-before its timestamp —
  *     equal timestamps match (tag orders right before left);
  *  3. filter back to left rows.
  *
  * ONE shuffle on the key — same cost as a regular join, no range
  * explosion, no per-key driver loop. Skew behaves like any windowed
  * aggregation (salt hot keys upstream if a single key dominates).
  * DuckDB's native `ASOF JOIN` is the oracle for this operator.
  */
object AsOfJoin {

  /** `left` and `right` must both carry `keys` and `tsCol`; the result
    * is every left row plus `valueCols` from the matched right row
    * (null when no right row precedes it).
    *
    * CALLER CONTRACT — unique (keys, ts) on the right: ties among right
    * rows at the same (key, ts) break on `monotonically_increasing_id`,
    * which follows the right DataFrame's partition layout; when
    * duplicate (key, ts) rows carry DIFFERENT values, "last in
    * right-side order" is therefore not stable across partitionings
    * (ADVICE r3). Pre-aggregate the right side to one row per
    * (keys, ts) — every caller in this repo does — or the matched value
    * is partition-layout-dependent.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      tsCol: String,
      keys: Seq[String],
      valueCols: Seq[String]): DataFrame =
    join0(left, right, tsCol, keys, valueCols, forwardDir = false)

  /** Forward variant: for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` within the same key (equal timestamps match).
    * Same one-shuffle union+window plan, mirrored.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      tsCol: String,
      keys: Seq[String],
      valueCols: Seq[String]): DataFrame =
    join0(left, right, tsCol, keys, valueCols, forwardDir = true)

  /** Shared core. Right rows carry ALL their value columns inside ONE
    * struct, so a matched right row whose value is genuinely NULL still
    * counts as a match (last/first(ignoreNulls) skips NULL structs =
    * unmatched left rows, not NULL fields inside a matched struct).
    * `__rid` makes ties among right rows at the same (key, ts)
    * deterministic: backward takes the last in right-side order, forward
    * the first — matching DuckDB's ASOF tie behavior in each direction.
    * Equal timestamps match in both directions via the tag ordering
    * (right sorts on the match side of left at the same ts).
    */
  private def join0(
      left: DataFrame,
      right: DataFrame,
      tsCol: String,
      keys: Seq[String],
      valueCols: Seq[String],
      forwardDir: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"value columns ${valueCols.mkString(",")} must not collide with left columns")

    val asofType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(right.schema.fieldIndex(c))))
    val taggedRight = right
      .select((keys.map(col) :+ col(tsCol)) ++ valueCols.map(col): _*)
      .withColumn("__tag", lit(0))
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("__asof", struct(valueCols.map(col): _*))
      .drop(valueCols: _*)
      .withColumns(leftCols.filterNot(c => keys.contains(c) || c == tsCol)
        .map(c => c -> lit(null)).toMap)
    val taggedLeft = left.withColumn("__tag", lit(1))
      .withColumn("__rid", lit(null).cast("bigint"))
      .withColumn("__asof", lit(null).cast(asofType))

    val unioned = taggedRight.unionByName(taggedLeft.select(taggedRight.columns.map(col): _*))
    val base = Window.partitionBy(keys.map(col): _*)
    val filled =
      if (forwardDir) {
        val w = base
          .orderBy(col(tsCol), col("__tag").desc, col("__rid").asc_nulls_first)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        unioned.withColumn("__asof", first(col("__asof"), ignoreNulls = true).over(w))
      } else {
        val w = base
          .orderBy(col(tsCol), col("__tag"), col("__rid").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      }
    filled.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col("__asof").getField(c).as(c)): _*)
  }

  /** Range join helper: pairs (l, r) with `r.ts` in `[l.ts - before,
    * l.ts]` per key — the windowed variant of the same blocking idea.
    * Implemented as an equi-join on a coarse time bucket (one shuffle,
    * bounded fan-out) + exact range filter, instead of a cartesian
    * range condition.
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame,
      tsCol: String, keys: Seq[String], beforeSeconds: Long): DataFrame = {
    require(beforeSeconds > 0,
      s"rangeJoin needs a positive window, got beforeSeconds=$beforeSeconds")
    val bucket = (c: Column) => floor(unix_timestamp(c) / beforeSeconds)
    val lb = left.withColumn("__b", explode(array(bucket(col(tsCol)) - 1, bucket(col(tsCol)))))
    val rb = right.withColumn("__b", bucket(col(tsCol)))
      .withColumnRenamed(tsCol, s"${tsCol}_r")
    lb.join(rb, keys :+ "__b")
      .filter(col(s"${tsCol}_r") <= col(tsCol) &&
        col(s"${tsCol}_r") >= col(tsCol) - expr(s"INTERVAL $beforeSeconds SECOND"))
      .drop("__b")
  }
}
