package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Connection resolution — the engine-side `conf.Datenverbindungen` +
  * `conf.Datenquellentypen` model (`/root/reference/res/conf/
  * Datenverbindungen.sql`, adapter factory `DBHelper.cs:288-354`): a
  * logical connection resolves to a Spark reader. The reference builds
  * ADO.NET adapters per DBMS type; here every type maps onto
  * `spark.read` options, so a step's source swaps between parquet
  * directories (the test environment), CSV drops and JDBC databases
  * without the step noticing.
  *
  * JDBC specifics re-expressed Spark-first (SURVEY §2.2):
  *  - the reference's 500k-row batch pagination
  *    (`CommandExecuter.cs:463-510`) becomes `fetchsize` + partitioned
  *    reads — executors stream concurrently instead of the driver
  *    paging serially;
  *  - the reference's serial month-slice loop becomes a `predicates`
  *    array — one partition per slice, scheduled in parallel;
  *  - full-query pushdown uses the `(query) q` dbtable subselect, the
  *    same trick the reference plays by shipping SQL text to the source.
  */
object Connections {

  sealed trait Spec
  /** Directory-of-parquet "database" (driver testdata / warehouse). */
  final case class ParquetDir(dir: String) extends Spec
  /** CSV drop directory with the reference's reader defaults. */
  final case class CsvDir(dir: String, header: Boolean = true, quote: String = "\"")
    extends Spec
  /** JDBC database — type covers the reference's MS-SQL / Oracle /
    * PostgreSQL / Caché spread (Spark ships dialects for the first
    * three; Caché rides the generic dialect).
    */
  final case class Jdbc(
      url: String,
      user: String,
      password: String,
      driver: Option[String] = None,
      fetchSize: Int = 10000,
      numPartitions: Int = 8) extends Spec

  /** A realization's resolved physical endpoints — the output of the
    * per-tenant chain `ETL_Konfigurationen` → `ETL_Mandanten_
    * Verbindungen` → `conf.Datenverbindungen`
    * (`Step.cs:1285-1767` GetRealizationConnections). The TARGET routes
    * step writes (`ConfigAssembly.warehouseFor`); a JDBC SOURCE routes
    * COPY's Befehl to that database via full-query pushdown
    * (`Steps.sourceFrame`, Derby-tested live); parquet/CSV sources keep
    * the registered-view model — the session catalog IS that source.
    */
  final case class Resolved(source: Spec, target: Spec)

  /** Reader options for a JDBC query source — unit-testable without a
    * live database. NOTE an un-predicated query read is ONE partition by
    * construction: Spark only parallelizes JDBC via
    * partitionColumn+bounds or per-partition predicates, and
    * `numPartitions` alone is a no-op for reads (r10 review — it used to
    * be set here, implying a parallelism that never existed). The
    * parallel path for COPY is the timeslice predicates
    * ([[read]]'s `predicates`, fed by `MonthWindows.predicates`);
    * `numPartitions` still applies to WRITES (it caps concurrent insert
    * connections).
    */
  def jdbcOptions(c: Jdbc, query: String): Map[String, String] =
    Map(
      "url" -> c.url,
      "user" -> c.user,
      "password" -> c.password,
      // full-query pushdown: the source DBMS executes the step SQL
      "dbtable" -> s"($query) q",
      "fetchsize" -> c.fetchSize.toString) ++
      c.driver.map("driver" -> _)

  /** Read a step's source query/table through a connection spec.
    * `predicates` (one per partition, e.g. from
    * `MonthWindows.predicates`) parallelize a JDBC read by slice.
    */
  def read(spark: SparkSession, spec: Spec, tableOrQuery: String,
      predicates: Seq[String] = Seq.empty): DataFrame = spec match {
    case ParquetDir(dir) =>
      spark.read.parquet(s"$dir/$tableOrQuery.parquet")
    case CsvDir(dir, header, quote) =>
      spark.read.option("header", header.toString).option("quote", quote)
        .csv(s"$dir/$tableOrQuery")
    case j: Jdbc =>
      val base: DataFrameReader = spark.read.format("jdbc")
      val withOpts = jdbcOptions(j, tableOrQuery).foldLeft(base)((r, kv) => r.option(kv._1, kv._2))
      if (predicates.isEmpty) withOpts.load()
      else {
        val props = new java.util.Properties()
        props.setProperty("user", j.user)
        props.setProperty("password", j.password)
        props.setProperty("fetchsize", j.fetchSize.toString)
        j.driver.foreach(props.setProperty("driver", _))
        spark.read.jdbc(j.url, s"($tableOrQuery) q", predicates.toArray, props)
      }
  }

  /** JDBC writer options for the bulk sink (`SqlBulkCopy` equivalent,
    * `CommandExecuter.cs:802-982`): the reference writes 50k-row chunks;
    * `batchsize` is the per-round-trip analog.
    */
  def jdbcWriteOptions(c: Jdbc, table: String, batchSize: Int = 50000): Map[String, String] =
    Map(
      "url" -> c.url,
      "user" -> c.user,
      "password" -> c.password,
      "dbtable" -> table,
      "batchsize" -> batchSize.toString,
      // writes DO honor numPartitions (Spark coalesces first): it caps
      // concurrent insert connections against the target DBMS
      "numPartitions" -> c.numPartitions.toString) ++
      c.driver.map("driver" -> _)
}
