package graft.sources

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSupport

/** The dependency-free xlsx codec: reference semantics
  * (`CommandExecuter.cs:1915-2027` — first sheet, first used row =
  * header, Skip(1+start)/end-start batch, values as strings) plus the
  * package-format corners: shared vs inline strings, date styles,
  * sparse cells, rel-resolved sheet paths.
  */
class XlsxSpec extends AnyFunSuite with SparkSupport {

  private def writeTmp(header: Seq[String], rows: Seq[Seq[Any]]): Array[Byte] = {
    val p = Files.createTempFile("xlsx-spec", ".xlsx")
    Xlsx.write(p.toString, header, rows)
    Files.readAllBytes(p)
  }

  test("round trip: strings, numbers, booleans, dates, nulls") {
    val ts = LocalDateTime.of(2026, 3, 15, 14, 45, 30)
    val bytes = writeTmp(
      Seq("name", "n", "x", "flag", "ts", "gap"),
      Seq(
        Seq("alpha", 5, 2.75, true, ts, None),
        Seq("bëta & <co>", -17, 0.5, false, ts.plusDays(400), "end")))
    val t = Xlsx.parse(bytes)
    assert(t.header == Seq("name", "n", "x", "flag", "ts", "gap"))
    assert(t.rows(0) == Seq(Some("alpha"), Some("5"), Some("2.75"), Some("true"),
      Some("2026-03-15 14:45:30"), None))
    assert(t.rows(1) == Seq(Some("bëta & <co>"), Some("-17"), Some("0.5"), Some("false"),
      Some("2027-04-19 14:45:30"), Some("end")))
  }

  test("shared strings deduplicate: repeated values resolve through the table") {
    val bytes = writeTmp(Seq("a", "b"), Seq.tabulate(10)(_ => Seq("same", "same")))
    val t = Xlsx.parse(bytes)
    assert(t.rows.size == 10)
    assert(t.rows.forall(_ == Seq(Some("same"), Some("same"))))
    // the writer interned "same" once — 20 cells, one <si>
    val sst = unzipEntry(bytes, "xl/sharedStrings.xml")
    assert("<si>".r.findAllIn(sst).size == 3) // "a", "b", "same"
  }

  test("row range: start/end batch like the reference's paged read") {
    val bytes = writeTmp(Seq("id"), (1 to 10).map(i => Seq(i)))
    val t = Xlsx.parse(bytes, start = 3, end = 7)
    assert(t.rows.map(_.head.get) == Vector("4", "5", "6", "7"))
    assert(Xlsx.parse(bytes, start = 0, end = 2).rows.size == 2)
    assert(Xlsx.parse(bytes).rows.size == 10)
  }

  test("sparse cells position by reference; short rows pad to header width") {
    // hand-built sheet: row 2 has only C2, row 3 only A3
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>h1</t></is></c><c r="B1" t="inlineStr"><is><t>h2</t></is></c><c r="C1" t="inlineStr"><is><t>h3</t></is></c></row>
        |<row r="2"><c r="C2"><v>9</v></c></row>
        |<row r="3"><c r="A3"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bytes = zipOf(Map("xl/worksheets/sheet1.xml" -> sheet))
    val t = Xlsx.parse(bytes)
    assert(t.header == Seq("h1", "h2", "h3"))
    assert(t.rows(0) == Seq(None, None, Some("9")))
    assert(t.rows(1) == Seq(Some("1"), None, None))
  }

  test("first sheet resolves through workbook.xml rels, not a hardcoded name") {
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c t="inlineStr"><is><t>col</t></is></c></row>
        |<row r="2"><c><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val wb =
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Odd" sheetId="1" r:id="rId9"/></sheets></workbook>""".stripMargin
    val rels =
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId9" Type="t" Target="worksheets/odd_name.xml"/></Relationships>""".stripMargin
    val bytes = zipOf(Map(
      "xl/workbook.xml" -> wb,
      "xl/_rels/workbook.xml.rels" -> rels,
      "xl/worksheets/odd_name.xml" -> sheet))
    val t = Xlsx.parse(bytes)
    assert(t.header == Seq("col"))
    assert(t.rows == Vector(Vector(Some("7"))))
  }

  test("custom date format codes are recognized; plain numerics are not") {
    val styles =
      """<?xml version="1.0"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="2">
        |<numFmt numFmtId="164" formatCode="dd/mm/yyyy"/>
        |<numFmt numFmtId="165" formatCode="#,##0.00"/>
        |</numFmts>
        |<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="164"/><xf numFmtId="165"/></cellXfs>
        |</styleSheet>""".stripMargin
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c t="inlineStr"><is><t>d</t></is></c><c t="inlineStr"><is><t>n</t></is></c></row>
        |<row r="2"><c r="A2" s="1"><v>46107</v></c><c r="B2" s="2"><v>46107</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bytes = zipOf(Map("xl/worksheets/sheet1.xml" -> sheet, "xl/styles.xml" -> styles))
    val t = Xlsx.parse(bytes)
    assert(t.rows(0)(0) == Some("2026-03-26 00:00:00")) // serial 46107 through the date style
    assert(t.rows(0)(1) == Some("46107"))               // same serial, numeric style
  }

  test("toDataFrame: header-named all-string columns, executor-side decode") {
    val p = Files.createTempFile("xlsx-df", ".xlsx")
    Xlsx.write(p.toString, Seq("k", "v"), Seq(Seq(1, "x"), Seq(2, "y"), Seq(3, None)))
    val df = Xlsx.toDataFrame(spark, p.toString)
    assert(df.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("k", "string"), ("v", "string")))
    val rows = df.orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("1", "x"), ("2", "y"), ("3", null)))
  }

  test("DSv2: spark.read.format(\"xlsx\") matches toDataFrame (r11, SURVEY §4.2)") {
    val p = Files.createTempFile("xlsx-dsv2", ".xlsx")
    Xlsx.write(p.toString, Seq("k", "v"), Seq(Seq(1, "x"), Seq(2, "y"), Seq(3, None)))
    val df = spark.read.format("xlsx").load(p.toString)
    assert(df.schema == Xlsx.toDataFrame(spark, p.toString).schema)
    val rows = df.orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("1", "x"), ("2", "y"), ("3", null)))
    // the start/end row window maps to the same parse bounds
    val windowed = spark.read.format("xlsx")
      .option("start", 1).option("end", 2).load(p.toString)
    assert(windowed.collect().map(_.getString(0)).toSeq == Seq("2"))
  }

  test("DSv2: a directory is one task per workbook; columns match by header name per file") {
    val dir = Files.createTempDirectory("xlsx-dsv2-dir")
    Xlsx.write(dir.resolve("a.xlsx").toString, Seq("k", "v"), Seq(Seq(1, "x")))
    // second workbook: reordered header + a column the first lacks
    Xlsx.write(dir.resolve("b.xlsx").toString, Seq("v", "k", "extra"),
      Seq(Seq("y", 2, "z")))
    val df = spark.read.format("xlsx")
      .schema(org.apache.spark.sql.types.StructType.fromDDL("k STRING, v STRING"))
      .load(dir.toString)
    assert(df.rdd.getNumPartitions == 2, "one InputPartition per workbook")
    val rows = df.orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("1", "x"), ("2", "y")),
      "columns must match by header name per file, not by position")
    // a column missing from a file yields nulls, like the align contract
    val withMissing = spark.read.format("xlsx")
      .schema(org.apache.spark.sql.types.StructType.fromDDL("k STRING, extra STRING"))
      .load(dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(withMissing.toSeq == Seq(("1", null), ("2", "z")))
    // inferred schema comes from the first file's header (sorted order)
    assert(spark.read.format("xlsx").load(dir.toString).columns.toSeq == Seq("k", "v"))
    // the all-string contract is loud, not a silent null-cast
    val e = intercept[IllegalArgumentException] {
      spark.read.format("xlsx")
        .schema(org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .load(dir.toString)
    }
    assert(e.getMessage.contains("all-string"))
  }

  test("DSv2: workbooks are addressable from SQL via USING xlsx (step-SQL surface)") {
    val p = Files.createTempFile("xlsx-sql", ".xlsx")
    Xlsx.write(p.toString, Seq("id", "name"), Seq(Seq(1, "a"), Seq(2, "b")))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW xlsx_v USING xlsx OPTIONS (path '${p.toString}')")
    try {
      val got = spark.sql("SELECT id, name FROM xlsx_v ORDER BY id")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.toSeq == Seq(("1", "a"), ("2", "b")))
    } finally spark.sql("DROP VIEW IF EXISTS xlsx_v")
  }

  test("date1904 workbooks shift the serial epoch (Mac-legacy date system)") {
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c t="inlineStr"><is><t>d</t></is></c></row>
        |<row r="2"><c r="A2" s="1"><v>100</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val styles =
      """<?xml version="1.0"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs></styleSheet>""".stripMargin
    def wb(flag: String) =
      s"""<?xml version="1.0"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<workbookPr date1904="$flag"/></workbook>""".stripMargin
    val mac = Xlsx.parse(zipOf(Map(
      "xl/worksheets/sheet1.xml" -> sheet, "xl/styles.xml" -> styles,
      "xl/workbook.xml" -> wb("1"))))
    assert(mac.rows(0)(0) == Some("1904-04-10 00:00:00")) // 1904-01-01 + 100 days
    val win = Xlsx.parse(zipOf(Map(
      "xl/worksheets/sheet1.xml" -> sheet, "xl/styles.xml" -> styles,
      "xl/workbook.xml" -> wb("0"))))
    assert(win.rows(0)(0) == Some("1900-04-09 00:00:00")) // 1899-12-30 + 100 days
  }

  test("empty sheet yields an empty table (reference logs and skips)") {
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData/></worksheet>""".stripMargin
    val t = Xlsx.parse(zipOf(Map("xl/worksheets/sheet1.xml" -> sheet)))
    assert(t.header.isEmpty && t.rows.isEmpty)
  }

  private def unzipEntry(bytes: Array[Byte], name: String): String = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .collectFirst { case e if e.getName == name => new String(zin.readAllBytes(), "UTF-8") }
        .getOrElse(fail(s"entry $name missing"))
    } finally zin.close()
  }

  test("shared strings exclude phonetic rPh runs (furigana must not concatenate into the value)") {
    val shared =
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1">
        |<si><t>東京</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh><phoneticPr fontId="1"/></si>
        |</sst>""".stripMargin
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c t="inlineStr"><is><t>city</t></is></c></row>
        |<row r="2"><c t="s"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bytes = zipOf(Map(
      "xl/worksheets/sheet1.xml" -> sheet,
      "xl/sharedStrings.xml" -> shared))
    val t = Xlsx.parse(bytes)
    assert(t.rows == Vector(Vector(Some("東京"))),
      "phonetic <rPh> text runs must be excluded from the cell value")
  }

  private def zipOf(entries: Map[String, String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }
}
