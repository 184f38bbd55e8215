package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Partition-parallel sliding windows over a numeric ordering column.
  *
  * A bare `Window.orderBy(k).rangeBetween(-P, 0)` has no partition key,
  * so Spark moves EVERY row through one task ("WindowExec: No Partition
  * Defined" — the single-partition serialization the driver's bench log
  * warns about). But a bounded-preceding frame only ever looks back `P`
  * on the ordering axis, so the computation decomposes: partition by a
  * coarse bucket of width `B >= P`, replicate the boundary strip into
  * the NEXT bucket, window inside each bucket, keep owner rows.
  *
  *   bucket(k) = floor(k / B);  a row also copies into bucket+1 when
  *   k >= (bucket+1)·B − P  (it can appear in frames across the edge).
  *
  * Every frame is then complete within its bucket: an owner row k in
  * bucket b needs rows with keys in [k−P, k]; those outside b live in
  * [b·B−P, b·B) and are exactly the replicated strip. Cost: ONE shuffle
  * on the bucket id, P/B replication overhead (≈4% at the q30 shape),
  * and all 32 (or 1000×32) cores busy — vs. the single task of the
  * naive frame. At 100 TB, pick B so one bucket ≈ one task's worth of
  * rows; the replication fraction P/B stays the only overhead.
  *
  * The reference runs its sliding aggregates inside the target DBMS
  * (`res/` report SQL, SURVEY §2.5) and inherits whatever parallelism
  * the DBMS window operator has; this is the shape that keeps the same
  * semantics partition-parallel on Spark.
  */
object BucketedWindow {

  /** `df` gains one column per `(name, frame => expr)` pair, where each
    * expr is an aggregate `.over(frame)` and the frame is
    * `RANGE BETWEEN preceding PRECEDING AND CURRENT ROW` on `orderCol`
    * (numeric). Result values are identical to the global
    * `Window.orderBy(orderCol)` plan — only the physical distribution
    * changes.
    */
  def rangePreceding(
      df: DataFrame,
      orderCol: String,
      preceding: Long,
      bucketWidth: Long)(
      aggs: Seq[(String, WindowSpec => Column)]): DataFrame = {
    require(preceding >= 0, s"preceding must be >= 0, got $preceding")
    require(bucketWidth > preceding,
      s"bucketWidth ($bucketWidth) must exceed preceding ($preceding) so a frame " +
        "spans at most one bucket boundary")
    val originalCols = df.columns.toSeq
    val k = col(orderCol)
    // bucket = floor(k / width), computed in the key's OWN arithmetic:
    //  - integral keys use exact integer division (`k / width` on longs
    //    is double division in Spark and rounds keys above 2^53 —
    //    epoch-nanos territory — onto the wrong bucket; `div` truncates
    //    toward zero, so negative non-multiples adjust down to a floor);
    //  - fractional/decimal keys keep floor(k / width) — their frames
    //    are defined in that same arithmetic, so there is nothing more
    //    exact to compute.
    import org.apache.spark.sql.types._
    val bkt = df.schema(orderCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val trunc = expr(s"`$orderCol` div $bucketWidth")
        when(k < 0 && pmod(k, lit(bucketWidth)) =!= 0, trunc - 1).otherwise(trunc)
      case DoubleType | FloatType | _: DecimalType =>
        floor(k / bucketWidth)
      case other => throw new IllegalArgumentException(
        s"rangePreceding needs a numeric ordering column; $orderCol is $other")
    }
    // owner copy always; boundary-strip rows also copy into the next bucket
    val assigned = df.withColumn("__asg",
      explode(when(k >= (bkt + 1) * bucketWidth - preceding,
        array(struct(bkt.as("b"), lit(true).as("own")),
          struct((bkt + 1).as("b"), lit(false).as("own"))))
        .otherwise(array(struct(bkt.as("b"), lit(true).as("own"))))))
    val frame = Window.partitionBy(col("__asg.b")).orderBy(k)
      .rangeBetween(-preceding, Window.currentRow)
    val windowed = aggs.foldLeft(assigned) { case (d, (name, agg)) =>
      d.withColumn(name, agg(frame))
    }
    windowed.filter(col("__asg.own"))
      .select((originalCols ++ aggs.map(_._1)).map(col): _*)
  }
}
