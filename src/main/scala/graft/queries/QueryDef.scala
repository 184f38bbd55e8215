package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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
  /** Timestamps must leave Spark as NTZ so the parquet the driver hands to
    * DuckDB carries naive timestamps, matching what the oracle computes from
    * the (naive) source columns. Session TZ is UTC so the conversion is the
    * identity.
    */
  def ntz(c: Column): Column = c.cast("timestamp_ntz")
}
