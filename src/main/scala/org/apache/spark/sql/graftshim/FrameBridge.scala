package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** InternalRow-RDD → DataFrame bridge. Spark 4 keeps
  * `internalCreateDataFrame` `private[sql]`, but an iterative operator
  * that fuses its per-round lineage cut with its convergence count (one
  * action materializes the localCheckpoint AND evaluates the movement
  * accumulator) needs to wrap the checkpointed RDD back into a frame
  * for the next round — same one-file shim technique as [[ColumnBridge]];
  * nothing in Spark is modified.
  */
object FrameBridge {
  def ofInternal(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
