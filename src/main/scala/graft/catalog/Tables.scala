package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog over the driver-provided parquet testdata (TESTDATA.md) and — in
  * production — over any directory-of-parquet "database".
  *
  * Mirrors the reference's data-plane: the C# service treats payload schemas
  * as runtime-inferred from the source (`DBHelper.cs:288-354`,
  * `GetDataTableFromQuery`); here the source of truth is the parquet footer
  * and Catalyst infers everything else. At 100 TB these would be
  * directory-partitioned tables; the loader keeps that swap invisible to
  * the operators (they only see a DataFrame).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark does not model
    * natively; we read nanos as long (see session conf in Sessions) and
    * rebuild a microsecond timestamp. All other tables load as-is.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so `spark.sql` text (SQL_TARGET /
    * SQL_SOURCE steps, report views) resolves the same names the DuckDB
    * oracle sees.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
