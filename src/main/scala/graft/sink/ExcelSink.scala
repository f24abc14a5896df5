package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Excel workbook sink (SURVEY.md §2.1 S7 — ref
  * `scanner/DGIS_SCAN_2_stable.py:429-467`, which exports the member
  * catalog per-dimension into one styled workbook via openpyxl).
  *
  * Format: SpreadsheetML 2003 (`.xml` workbook) — the XML dialect Excel,
  * LibreOffice and Google Sheets all open natively. Chosen deliberately:
  * it needs ZERO dependencies (a zipped OOXML writer would need a POI-
  * style library, unavailable offline), is plain text (diffable,
  * testable with the JDK's DOM parser), and carries the features the
  * reference actually uses — multiple named worksheets, a bold header
  * row, and typed Number/String cells.
  *
  * Scale rule: like every export sink here this is the INTERACTIVE
  * download path (the reference writes workbooks a human opens);
  * `collect()` per sheet is bounded by [[maxRowsPerSheet]] (Excel's own
  * 2003-format row ceiling) — engine-path data movement never goes
  * through a workbook.
  */
object ExcelSink {

  /** SpreadsheetML's hard row limit per worksheet (65 536 incl. header). */
  val maxRowsPerSheet: Int = 65535

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def isFinite(v: Any): Boolean = v match {
    case d: Double => !d.isNaN && !d.isInfinite
    case f: Float  => !f.isNaN && !f.isInfinite
    case _ => true
  }

  private def cellXml(value: Any, dt: DataType): String = value match {
    case null => "<Cell><Data ss:Type=\"String\"></Data></Cell>"
    case v => dt match {
      // NaN/Infinity are not valid SpreadsheetML Number content — Excel and
      // LibreOffice reject the workbook — so emit them as String cells.
      case _: FloatType | _: DoubleType if !isFinite(v) =>
        s"""<Cell><Data ss:Type="String">${esc(v.toString)}</Data></Cell>"""
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: FloatType | _: DoubleType | _: DecimalType =>
        s"""<Cell><Data ss:Type="Number">$v</Data></Cell>"""
      case _: BooleanType =>
        s"""<Cell><Data ss:Type="Boolean">${if (v == true) 1 else 0}</Data></Cell>"""
      case _ =>
        s"""<Cell><Data ss:Type="String">${esc(v.toString)}</Data></Cell>"""
    }
  }

  /** Write `sheets` (name -> DataFrame) as one SpreadsheetML workbook.
    * Sheet order and row order are preserved; string cells are scrubbed
    * of control characters like every other export (F8). Oversized
    * frames fail fast rather than truncate silently. */
  def writeWorkbook(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    val w = new java.io.PrintWriter(path, "UTF-8")
    try {
      w.println("""<?xml version="1.0" encoding="UTF-8"?>""")
      w.println("""<?mso-application progid="Excel.Sheet"?>""")
      w.println("""<Workbook xmlns="urn:schemas-microsoft-com:office:spreadsheet"""")
      w.println("""          xmlns:ss="urn:schemas-microsoft-com:office:spreadsheet">""")
      w.println("""<Styles><Style ss:ID="hdr"><Font ss:Bold="1"/></Style></Styles>""")
      sheets.foreach { case (name, df0) =>
        val df = Sinks.scrubbed(df0)
        val rows = df.collect()
        require(rows.length <= maxRowsPerSheet,
          s"sheet '$name' exceeds $maxRowsPerSheet rows (${rows.length}); " +
            "export paginated or use the CSV sink")
        val fields = df.schema.fields
        w.println(s"""<Worksheet ss:Name="${esc(name)}"><Table>""")
        w.println(fields.map(f =>
            s"""<Cell ss:StyleID="hdr"><Data ss:Type="String">${esc(f.name)}</Data></Cell>""")
          .mkString("<Row>", "", "</Row>"))
        rows.foreach { r =>
          w.println(fields.indices.map(i => cellXml(r.get(i), fields(i).dataType))
            .mkString("<Row>", "", "</Row>"))
        }
        w.println("</Table></Worksheet>")
      }
      w.println("</Workbook>")
    } finally w.close()
  }
}
