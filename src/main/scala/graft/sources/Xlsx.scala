package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Dependency-free `.xlsx` codec — the decode slot of the S3 TRANSFER
  * ingest (`/root/reference/code/DIZService.Core/CommandExecuter.cs:
  * 1915-2027` reads the FIRST worksheet with ClosedXML: first used row =
  * headers, data rows `Skip(1 + start)` up to `end - start` rows, every
  * cell value `ToString()`). No POI/ClosedXML exists in this
  * environment, and `.xlsx` is just a zip of XML — so this parses the
  * package with `java.util.zip` + StAX (both JDK): `sharedStrings.xml`
  * for the string table, `styles.xml` to recognize date-formatted
  * numerics, and the first worksheet (resolved through
  * `workbook.xml` + its rels, like a real consumer, not a hardcoded
  * `sheet1.xml`).
  *
  * All values come back as strings (the reference's `ToString()`
  * contract — its DataTable columns are strings until SqlBulkCopy):
  * shared/inline/formula strings verbatim, booleans as true/false,
  * numbers in their lexical form, date-styled numbers rendered
  * `yyyy-MM-dd HH:mm:ss` from the Excel serial (epoch 1899-12-30, the
  * serial already embeds the 1900 leap-year quirk).
  *
  * Scale shape: one `.xlsx` is one zip — inherently unsplittable — so
  * the distributed unit is the FILE: [[toDataFrame]] parses the header
  * driver-side with an early-stop stream (schema only), then decodes the
  * body inside an executor task via the `binaryFile` source. Many files
  * ingest as many parallel tasks; a single file costs one task, same as
  * any other non-splittable container (gzip CSV, audio blob).
  */
object Xlsx {

  /** Excel's day-serial epoch (the 1900 system as implemented: day 1 =
    * 1900-01-01 with the phantom 1900-02-29, net effect epoch is
    * 1899-12-30 for every modern serial).
    */
  private val Epoch = LocalDateTime.of(1899, 12, 30, 0, 0, 0)
  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30). */
  private val BuiltinDateFmts: Set[Int] = ((14 to 22) ++ (45 to 47)).toSet

  /** Parsed sheet: header (first used row) + data rows, `None` = blank
    * cell (ingested as SQL NULL, matching the CSV reader's empty-field
    * behavior).
    */
  final case class Table(header: IndexedSeq[String], rows: Vector[IndexedSeq[Option[String]]])

  // ------------------------------------------------------------------
  // reader
  // ------------------------------------------------------------------

  /** Decode an xlsx package. `start`/`end` are the reference's batch-read
    * row range over DATA rows: skip `start`, read at most `end - start`.
    */
  def parse(bytes: Array[Byte], start: Int = 0, end: Int = Int.MaxValue): Table =
    parseLimited(bytes, start, end, maxUsedRows = Int.MaxValue)

  /** Header only — stops streaming the worksheet after the first used
    * row, so driver-side schema discovery doesn't decode the body.
    */
  def parseHeader(bytes: Array[Byte]): IndexedSeq[String] =
    parseLimited(bytes, 0, 0, maxUsedRows = 1).header

  private def parseLimited(bytes: Array[Byte], start: Int, end: Int, maxUsedRows: Int): Table = {
    val es = entries(bytes)
    val sheetPath = firstSheetPath(es)
    val sheet = es.getOrElse(sheetPath,
      throw new IllegalArgumentException(s"xlsx has no worksheet at $sheetPath"))
    val shared = es.get("xl/sharedStrings.xml").map(sharedStrings).getOrElse(Vector.empty)
    val dates = es.get("xl/styles.xml").map(dateStyleIndexes).getOrElse(Set.empty)
    val date1904 = es.get("xl/workbook.xml").exists(isDate1904)
    val used = sheetRows(sheet, shared, dates, date1904, maxUsedRows)
    if (used.isEmpty) Table(Vector.empty, Vector.empty)
    else {
      val header = used.head.zipWithIndex.map { case (h, i) => h.getOrElse(s"_c$i") }
      val take = if (end == Int.MaxValue) Int.MaxValue else math.max(0, end - start)
      val data = used.drop(1 + math.max(0, start)).take(take)
        .map(r => r.padTo(header.length, None).take(header.length))
      Table(header, data)
    }
  }

  /** The ingest `FileReader` shape: all-string columns named by the
    * header row (like the CSV reader), body decoded in an executor task.
    */
  def toDataFrame(spark: SparkSession, file: String,
      start: Int = 0, end: Int = Int.MaxValue): DataFrame = {
    val header = parseHeader(Files.readAllBytes(Paths.get(file)))
    require(header.nonEmpty, s"xlsx $file has no used rows (no header)")
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rows = spark.read.format("binaryFile").load(file)
      .select("content").rdd
      .flatMap { r =>
        parse(r.getAs[Array[Byte]](0), start, end).rows
          .map(cells => Row.fromSeq(cells.map(_.orNull)))
      }
    spark.createDataFrame(rows, schema)
  }

  /** Unzip the package into entry-name → bytes (xlsx parts are small;
    * the worksheet is the only entry that can be large and we stream it
    * again with StAX from these bytes).
    */
  private def entries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      val out = Map.newBuilder[String, Array[Byte]]
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
        e = zin.getNextEntry
      }
      out.result()
    } finally zin.close()
  }

  private def xmlFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** First sheet's part path: workbook.xml's first `<sheet r:id=…>`
    * resolved through workbook.xml.rels; falls back to the conventional
    * `xl/worksheets/sheet1.xml` when either part is absent.
    */
  private def firstSheetPath(es: Map[String, Array[Byte]]): String = {
    val resolved = for {
      wb <- es.get("xl/workbook.xml")
      rid <- firstSheetRelId(wb)
      rels <- es.get("xl/_rels/workbook.xml.rels")
      target <- relTarget(rels, rid)
    } yield if (target.startsWith("/")) target.drop(1) else s"xl/$target"
    resolved.getOrElse("xl/worksheets/sheet1.xml")
  }

  /** Mac-legacy 1904 date system: `<workbookPr date1904="1"/>` shifts
    * the serial epoch to 1904-01-01.
    */
  private def isDate1904(workbook: Array[Byte]): Boolean = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(workbook))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "workbookPr") {
          val v = r.getAttributeValue(null, "date1904")
          return v == "1" || v == "true"
        }
      }
      false
    } finally r.close()
  }

  private def firstSheetRelId(workbook: Array[Byte]): Option[String] = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(workbook))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          var i = 0
          while (i < r.getAttributeCount) {
            if (r.getAttributeLocalName(i) == "id") return Some(r.getAttributeValue(i))
            i += 1
          }
        }
      }
      None
    } finally r.close()
  }

  private def relTarget(rels: Array[Byte], rid: String): Option[String] = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(rels))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship" &&
            r.getAttributeValue(null, "Id") == rid)
          return Option(r.getAttributeValue(null, "Target"))
      }
      None
    } finally r.close()
  }

  /** `<si>` entries: each is the concatenation of its `<t>` runs (plain
    * and rich-text strings both flatten to that).
    */
  private def sharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    try {
      val out = Vector.newBuilder[String]
      var sb: StringBuilder = null
      var inT = false
      // <rPh> runs are PHONETIC hints (furigana) riding alongside the
      // text runs; flattening their <t> too would corrupt every string
      // cell from workbooks saved with phonetic data ("東京" would ingest
      // as "東京トウキョウ" — r10 review; real readers exclude rPh)
      var inRPh = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => sb = new StringBuilder
          case "rPh" => inRPh = true
          case "t" if sb != null && !inRPh => inT = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "si" => out += sb.toString; sb = null
          case "rPh" => inRPh = false
          case "t"  => inT = false
          case _    => ()
        }
        case _ => ()
      }
      out.result()
    } finally r.close()
  }

  /** Style indexes (cellXfs order) whose number format is a date: the
    * builtin date ids or a custom code containing day/month/year/time
    * letters outside brackets and quoted literals.
    */
  private def dateStyleIndexes(bytes: Array[Byte]): Set[Int] = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    try {
      val custom = mutable.Map.empty[Int, String]
      val xfs = mutable.ArrayBuffer.empty[Int]
      var inCellXfs = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            (Option(r.getAttributeValue(null, "numFmtId")),
              Option(r.getAttributeValue(null, "formatCode"))) match {
              case (Some(id), Some(code)) => custom(id.toInt) = code
              case _ => ()
            }
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            xfs += Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt).getOrElse(0)
          case _ => ()
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ => ()
      }
      xfs.zipWithIndex.collect {
        case (fmt, i) if BuiltinDateFmts(fmt) || custom.get(fmt).exists(looksLikeDateFormat) => i
      }.toSet
    } finally r.close()
  }

  private def looksLikeDateFormat(code: String): Boolean = {
    val cleaned = code
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\"[^\"]*\"", "")
    cleaned.exists(c => "ymdhsYMDHS".indexOf(c.toInt) >= 0)
  }

  /** Stream the worksheet into dense per-row cells. Sparse cells are
    * positioned by their `r="B3"` reference (gaps become None); rows
    * with no non-blank cell are dropped — ClosedXML's RowsUsed().
    */
  private def sheetRows(
      sheet: Array[Byte],
      shared: IndexedSeq[String],
      dateStyles: Set[Int],
      date1904: Boolean,
      maxUsedRows: Int): Vector[IndexedSeq[Option[String]]] = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(sheet))
    try {
      val rows = Vector.newBuilder[IndexedSeq[Option[String]]]
      var used = 0
      var cells: mutable.ArrayBuffer[Option[String]] = null
      var nextCol = 0
      var cellCol = 0
      var cellType = ""
      var cellStyle = 0
      var text: StringBuilder = null
      var capture = false

      def place(idx: Int, v: Option[String]): Unit = {
        while (cells.length <= idx) cells += None
        cells(idx) = v
      }

      while (r.hasNext && used < maxUsedRows) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            cells = mutable.ArrayBuffer.empty[Option[String]]
            nextCol = 0
          case "c" if cells != null =>
            cellCol = Option(r.getAttributeValue(null, "r"))
              .map(colIndexOf).getOrElse(nextCol)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            cellStyle = Option(r.getAttributeValue(null, "s")).map(_.toInt).getOrElse(0)
            text = new StringBuilder
          case "v" | "t" if text != null => capture = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if capture =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => capture = false
          case "c" if cells != null =>
            place(cellCol,
              cellValue(text.toString, cellType, cellStyle, shared, dateStyles, date1904))
            nextCol = cellCol + 1
            text = null
          case "row" =>
            if (cells.exists(_.isDefined)) { rows += cells.toIndexedSeq; used += 1 }
            cells = null
          case _ => ()
        }
        case _ => ()
      }
      rows.result()
    } finally r.close()
  }

  private def cellValue(
      raw: String, t: String, style: Int,
      shared: IndexedSeq[String], dateStyles: Set[Int], date1904: Boolean): Option[String] = {
    val v = t match {
      case "s"                 => shared(raw.trim.toInt)
      case "inlineStr" | "str" => raw
      case "b"                 => if (raw.trim == "1") "true" else "false"
      case "e"                 => "" // error cell → NULL
      case _ => // numeric (possibly date-styled)
        if (raw.isEmpty) ""
        else if (dateStyles(style)) serialToTimestamp(raw.toDouble, date1904)
        else raw
    }
    if (v.isEmpty) None else Some(v)
  }

  private val Epoch1904 = LocalDateTime.of(1904, 1, 1, 0, 0, 0)

  private def serialToTimestamp(serial: Double, date1904: Boolean): String =
    (if (date1904) Epoch1904 else Epoch)
      .plusSeconds(math.round(serial * 86400.0)).format(TsFmt)

  /** "BC7" → 0-based column 54. */
  private def colIndexOf(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  // ------------------------------------------------------------------
  // writer (fixtures + round-trip verification)
  // ------------------------------------------------------------------

  /** Minimal xlsx writer — enough of ECMA-376 for the reader's input
    * contract: one worksheet, a shared-string table (exercises the
    * string-table path, not just inline strings), a date style
    * (numFmtId 22) for timestamp cells. Cell typing: String → shared
    * string, Boolean → b, LocalDateTime/Timestamp → date-styled serial,
    * Number → plain numeric, None/null → blank.
    */
  def write(path: String, header: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    val shared = mutable.LinkedHashMap.empty[String, Int]
    def sidx(s: String): Int = shared.getOrElseUpdate(s, shared.size)

    def cellXml(ref: String, v: Any): String = v match {
      case null | None    => ""
      case Some(x)        => cellXml(ref, x)
      case s: String      => s"""<c r="$ref" t="s"><v>${sidx(s)}</v></c>"""
      case b: Boolean     => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case d: LocalDateTime =>
        val serial = java.time.Duration.between(Epoch, d).getSeconds / 86400.0
        s"""<c r="$ref" s="1"><v>$serial</v></c>"""
      case t: java.sql.Timestamp => cellXml(ref, t.toLocalDateTime)
      case n: java.lang.Number   => s"""<c r="$ref"><v>$n</v></c>"""
      case other                 => cellXml(ref, other.toString)
    }

    val allRows = header +: rows
    val sheetData = allRows.zipWithIndex.map { case (cells, i) =>
      val cs = cells.zipWithIndex.map { case (v, j) => cellXml(s"${colName(j)}${i + 1}", v) }
      s"""<row r="${i + 1}">${cs.mkString}</row>"""
    }.mkString

    val main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val relNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="$main"><sheetData>$sheetData</sheetData></worksheet>""".stripMargin
    val sharedXml = {
      val sis = shared.keys.map(s => s"""<si><t xml:space="preserve">${escape(s)}</t></si>""")
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="$main" count="${shared.size}" uniqueCount="${shared.size}">${sis.mkString}</sst>""".stripMargin
    }
    val stylesXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<styleSheet xmlns="$main">
         |<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>
         |<borders count="1"><border/></borders>
         |<cellStyleXfs count="1"><xf/></cellStyleXfs>
         |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>
         |</styleSheet>""".stripMargin
    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="$main" xmlns:r="$relNs">
         |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin
    val workbookRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |<Relationship Id="rId1" Type="$relNs/worksheet" Target="worksheets/sheet1.xml"/>
         |<Relationship Id="rId2" Type="$relNs/sharedStrings" Target="sharedStrings.xml"/>
         |<Relationship Id="rId3" Type="$relNs/styles" Target="styles.xml"/>
         |</Relationships>""".stripMargin
    val rootRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |<Relationship Id="rId1" Type="$relNs/officeDocument" Target="xl/workbook.xml"/>
         |</Relationships>""".stripMargin
    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
         |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
         |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
         |</Types>""".stripMargin

    val zout = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    try {
      def put(name: String, content: String): Unit = {
        zout.putNextEntry(new ZipEntry(name))
        zout.write(content.getBytes("UTF-8"))
        zout.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbookXml)
      put("xl/_rels/workbook.xml.rels", workbookRels)
      put("xl/styles.xml", stylesXml)
      put("xl/sharedStrings.xml", sharedXml)
      put("xl/worksheets/sheet1.xml", sheetXml)
    } finally zout.close()
  }

  private def colName(idx0: Int): String = {
    var n = idx0 + 1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
