package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `TableProvider` for `.xlsx` workbooks — the idiomatic
  * deep cut SURVEY §4.2 names (r11 / VERDICT r10 stretch 7): the same
  * dependency-free [[Xlsx]] decoder behind
  * `spark.read.format("xlsx").load(path)`, which makes workbooks
  * addressable from step SQL (`CREATE TEMPORARY VIEW x USING xlsx`)
  * instead of only through the TRANSFER ingest path.
  *
  * Execution model mirrors [[Xlsx.toDataFrame]]'s split: schema
  * inference reads ONE header row on the driver (first file, like
  * Spark's CSV first-file header); each workbook decodes in its own
  * executor task (an xlsx is an unsplittable zip — the FILE is the unit
  * of parallelism, one `InputPartition` per file, so a directory of
  * workbooks scales out while one workbook stays a single task).
  * Columns are all-string, matched to the requested schema BY HEADER
  * NAME per file (a file missing a column yields nulls, extra columns
  * are ignored) — the CSV-reader contract the ingest path already pins.
  *
  * Options: `start` / `end` bound the body rows per file (the
  * [[Xlsx.parse]] window); paths resolve as a single file or a
  * directory of `*.xlsx`.
  */
class XlsxSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "xlsx"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = XlsxSource.activeHadoopConf()
    val files = XlsxSource.resolveFiles(options, conf)
    require(files.nonEmpty, "xlsx source: no .xlsx files under the given path")
    val header = Xlsx.parseHeader(XlsxSource.readFully(files.head, conf))
    require(header.nonEmpty, s"xlsx ${files.head} has no used rows (no header)")
    StructType(header.map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    schema.fields.foreach(f => require(f.dataType == StringType,
      s"xlsx source decodes all-string columns (like the CSV reader); " +
        s"column ${f.name} asks for ${f.dataType.simpleString} — cast after the read"))
    new XlsxSource.XlsxTable(schema, new CaseInsensitiveStringMap(properties))
  }
}

object XlsxSource {

  /** All file access goes through the Hadoop FileSystem API (r11 review
    * fix: the first cut used `java.nio.file`, which only works when
    * every executor shares the driver's local disk — on cluster storage
    * (HDFS / object stores) the scan must resolve paths and stream
    * bytes through the configured FS, exactly like the `binaryFile`
    * ingest path does).
    */
  private[sources] def activeHadoopConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  private[sources] def readFully(path: String, conf: Configuration): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** `path` option → concrete .xlsx file list (single file, or a
    * directory scanned non-recursively, sorted for determinism). */
  private[sources] def resolveFiles(options: CaseInsensitiveStringMap,
      conf: Configuration): Seq[String] = {
    val raw = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("xlsx source needs a path (spark.read.format(\"xlsx\").load(p))"))
    val p = new Path(raw)
    val fs = p.getFileSystem(conf)
    val status = fs.getFileStatus(p)
    if (status.isDirectory)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".xlsx"))
        .map(_.getPath.toString).sorted
    else Seq(status.getPath.toString)
  }

  private final class XlsxTable(schema: StructType, options: CaseInsensitiveStringMap)
      extends Table with SupportsRead {
    override def name(): String = s"xlsx:${options.get("path")}"
    override def schema(): StructType = schema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
      // merged runtime options (read-time .option overrides table props)
      val merged = new CaseInsensitiveStringMap(
        (options.asScala ++ caseInsensitiveOptions.asScala).asJava)
      new XlsxScan(schema, merged)
    }
  }

  private final class XlsxScan(schema: StructType, options: CaseInsensitiveStringMap)
      extends ScanBuilder with Scan with Batch {
    override def build(): Scan = this
    override def readSchema(): StructType = schema
    override def description(): String = s"XlsxScan ${options.get("path")}"
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      resolveFiles(options, activeHadoopConf()).map(XlsxInputPartition).toArray[InputPartition]
    override def createReaderFactory(): PartitionReaderFactory =
      XlsxReaderFactory(schema,
        Option(options.get("start")).map(_.toInt).getOrElse(0),
        Option(options.get("end")).map(_.toInt).getOrElse(Int.MaxValue),
        new org.apache.spark.util.SerializableConfiguration(activeHadoopConf()))
  }

  private final case class XlsxInputPartition(path: String) extends InputPartition

  private final case class XlsxReaderFactory(schema: StructType, start: Int, end: Int,
      conf: org.apache.spark.util.SerializableConfiguration)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      new XlsxPartitionReader(
        partition.asInstanceOf[XlsxInputPartition].path, schema, start, end, conf.value)
  }

  /** Executor-side decode of one workbook: the whole file is the task's
    * input (unsplittable zip), rows stream out as InternalRows with the
    * requested columns matched by header name. */
  private final class XlsxPartitionReader(path: String, schema: StructType,
      start: Int, end: Int, conf: Configuration) extends PartitionReader[InternalRow] {
    private val table = Xlsx.parse(readFully(path, conf), start, end)
    private val idx = schema.fieldNames.map(table.header.indexOf(_))
    private val rows = table.rows.iterator
    private var current: InternalRow = _
    override def next(): Boolean =
      if (!rows.hasNext) false
      else {
        val r = rows.next()
        current = InternalRow.fromSeq(idx.toIndexedSeq.map { i =>
          if (i >= 0 && i < r.length) r(i).map(UTF8String.fromString).orNull else null
        })
        true
      }
    override def get(): InternalRow = current
    override def close(): Unit = ()
  }
}
