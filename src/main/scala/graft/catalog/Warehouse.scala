package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Writable table store for step targets — directory-of-parquet tables,
  * the engine-side stand-in for the reference's target DBMS
  * (`SqlBulkCopy` sinks, `CommandExecuter.cs:802-982`). On a cluster
  * this is a warehouse path (or Delta/Iceberg catalog); steps only see
  * read/append/overwrite, so the swap is invisible to them.
  */
final class Warehouse(val dir: String, val format: String = "parquet") {

  private def path(table: String): String = s"$dir/$table"

  def exists(spark: SparkSession, table: String): Boolean =
    new java.io.File(s"${path(table)}/_SUCCESS").exists() ||
      new java.io.File(path(table)).exists()

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.format(format).load(path(table))

  /** Bulk append — the reference's `WriteToServer` fast path. */
  def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).format(format).save(path(table))

  def overwrite(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).format(format).save(path(table))

  /** Delete-by-predicate (the idempotent-ingest rollback,
    * `CommandExecuter.cs:1130-1157` `DELETE … WHERE Dateiname='f'`):
    * parquet has no row deletes, so rewrite-without-the-rows — the same
    * operation Delta's DELETE compiles to. Crash-safe swap: the old data
    * is renamed aside BEFORE the rewrite moves into place, so a crash at
    * any point leaves either the old or the new copy recoverable (never
    * a window where the table is only in a dir `read()` ignores).
    */
  def deleteWhere(spark: SparkSession, table: String, predicate: String): Unit = {
    if (exists(spark, table)) {
      val remaining = read(spark, table).filter(s"NOT ($predicate)")
      val tmp = s"${path(table)}__rewrite"
      remaining.write.mode(SaveMode.Overwrite).format(format).save(tmp)
      val target = new java.io.File(path(table))
      val old = new java.io.File(s"${path(table)}__old")
      if (old.exists()) deleteRecursively(old)
      if (!target.renameTo(old))
        throw new IllegalStateException(s"rename $target -> $old failed")
      if (!new java.io.File(tmp).renameTo(target)) {
        old.renameTo(target) // restore — the swap failed, keep the table readable
        throw new IllegalStateException(s"rename $tmp -> $target failed")
      }
      deleteRecursively(old)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
    ()
  }
}
