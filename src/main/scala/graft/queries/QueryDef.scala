package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable operator: a Spark plan plus (when SQL-expressible) the
  * equivalent DuckDB SQL the driver uses as oracle. Column names must match
  * exactly between the two — the driver sorts columns by name and hashes
  * values.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Cross-engine deterministic money arithmetic: the testdata doubles are
    * 2-dp values; casting to decimal before aggregating makes the sum exact
    * (order-independent), so Spark and DuckDB agree bit-for-bit after the
    * final cast back to double. A raw double SUM would differ in the last
    * ulps depending on partitioning — at 100 TB that nondeterminism is also
    * why you never hash raw float aggregates.
    */
  def moneySum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** Exact average: exact decimal sum divided by count in double (a single
    * IEEE division both engines perform identically).
    */
  def moneyAvg(c: Column): Column =
    (sum(c.cast("decimal(18,4)")).cast("double") / count(lit(1)))

  /** Timestamps must leave Spark as NTZ so the parquet the driver hands to
    * DuckDB carries naive timestamps, matching what the oracle computes from
    * the (naive) source columns. Session TZ is UTC so the conversion is the
    * identity.
    */
  def ntz(c: Column): Column = c.cast("timestamp_ntz")
}
