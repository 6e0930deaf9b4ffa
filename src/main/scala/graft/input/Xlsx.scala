package graft.input

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import scala.collection.mutable

/** Minimal spreadsheet sources: OOXML (.xlsx) and OpenDocument (.ods) —
  * the reference's pandas `read_excel` ingest path (`dataframe.py:161-190`)
  * re-expressed without a format library (none ships in this image; both
  * formats are just zipped XML, parsed here with `java.util.zip` +
  * `scala.xml` from the PUBLIC format specs).
  *
  * Shape note: spreadsheets are small single files by construction (the
  * reference routes them through driver-side pandas too), so the parse
  * runs on the driver and the rows enter Spark via `createDataFrame` —
  * the distributed pipeline starts at the first transformation. First row
  * is the header (pandas `read_excel` default); column types are inferred
  * (long -> double -> boolean -> string) like the reference's
  * pandas-to-Spark conversion. Cells styled with a date number format
  * (builtin ECMA-376 ids or custom date codes from styles.xml) surface
  * as ISO-8601 strings, 1900-leap-bug epoch handling included; ODS
  * date/time typed cells pass their ISO values through.
  */
object Xlsx {

  // ------------------------------------------------------------------
  // readers
  // ------------------------------------------------------------------

  def read(spark: SparkSession, path: String): DataFrame = {
    val cells =
      if (path.toLowerCase.endsWith(".ods")) readOdsCells(path)
      else readXlsxCells(path)
    toDataFrame(spark, cells)
  }

  /** OOXML builtin date/time numFmtIds (ECMA-376 §18.8.30): 14-22 the
    * core date/times, 27-36 locale-calendar variants, 45-47 durations
    * rendered as times, 50-58 more locale variants.
    */
  private[input] val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** Custom format code (numFmtId >= 164) is a date format if it uses
    * y/m/d/h/s date tokens outside quoted literals, [bracketed]
    * sections, and color/condition blocks — the standard heuristic
    * (same rule Apache POI documents for `isADateFormat`).
    */
  private[graft] def isDateFormatCode(code: String): Boolean = {
    var inQuote = false; var inBracket = false
    var i = 0
    while (i < code.length) {
      val c = code.charAt(i)
      if (inQuote) { if (c == '"') inQuote = false }
      else if (inBracket) { if (c == ']') inBracket = false }
      else c match {
        case '"' => inQuote = true
        case '[' => inBracket = true
        case '\\' => i += 1 // escaped literal
        case 'y' | 'Y' | 'd' | 'D' | 'h' | 'H' | 's' | 'S' | 'm' | 'M' =>
          return true
        case _ =>
      }
      i += 1
    }
    false
  }

  /** Style index (cellXfs position) -> is-date, from styles.xml. */
  private def dateStyles(stylesXml: Option[Array[Byte]]): Set[Int] =
    stylesXml match {
      case None => Set.empty
      case Some(bytes) =>
        val xml = scala.xml.XML.loadString(new String(bytes, "UTF-8"))
        // Malformed numFmtId attributes degrade to "not a date format"
        // (toIntOption), matching the file-wide policy that bad cells or
        // styles never fail the whole ingest.
        val customDateIds = (xml \ "numFmts" \ "numFmt").flatMap { f =>
          if (isDateFormatCode(f \@ "formatCode"))
            (f \@ "numFmtId").trim.toIntOption
          else None
        }.toSet
        (xml \ "cellXfs" \ "xf").zipWithIndex.collect {
          case (xf, i) if (xf \@ "numFmtId").trim.toIntOption.exists(n =>
            BuiltinDateFmts.contains(n) || customDateIds.contains(n)) => i
        }.toSet
    }

  /** Excel date serial -> ISO-8601 string. Epoch handling follows the
    * documented 1900 leap-year bug: serials 1-59 count from 1899-12-31,
    * serials >= 61 from 1899-12-30 (absorbing the fictitious
    * 1900-02-29); serial 60 itself surfaces as 1900-02-28. Fractional
    * days become a " HH:mm:ss" suffix (rounded to the second); pure
    * dates have none.
    */
  private[graft] def serialToIso(serial: Double): String = {
    val days = math.floor(serial).toLong
    val frac = serial - days
    val date =
      if (days < 61) java.time.LocalDate.of(1899, 12, 31)
        .plusDays(math.min(days, 59L))
      else java.time.LocalDate.of(1899, 12, 30).plusDays(days)
    val secs = math.round(frac * 86400.0)
    if (secs == 0L) date.toString
    else if (secs == 86400L) date.plusDays(1).toString
    else {
      val t = java.time.LocalTime.ofSecondOfDay(secs)
      s"$date ${"%02d:%02d:%02d".format(t.getHour, t.getMinute, t.getSecond)}"
    }
  }

  /** Raw cell grid of the first sheet: one Seq per row, ragged rows
    * padded later. Values are Some(string | double | boolean) or None.
    */
  private[input] def readXlsxCells(path: String): Seq[Seq[Option[Any]]] = {
    val parts = zipEntries(path, Set("xl/sharedStrings.xml",
      "xl/worksheets/sheet1.xml", "xl/styles.xml"))
    val dateStyleIdx = dateStyles(parts.get("xl/styles.xml"))
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml") match {
      case Some(bytes) =>
        // <si> items; each concatenates its <t> runs (rich text splits)
        (scala.xml.XML.loadString(new String(bytes, "UTF-8")) \ "si").map { si =>
          (si \\ "t").map(_.text).mkString
        }.toIndexedSeq
      case None => IndexedSeq.empty
    }
    val sheet = parts.getOrElse("xl/worksheets/sheet1.xml",
      throw new IllegalArgumentException(s"$path has no xl/worksheets/sheet1.xml"))
    val rowsXml = scala.xml.XML.loadString(new String(sheet, "UTF-8")) \ "sheetData" \ "row"
    rowsXml.map { row =>
      val out = mutable.ArrayBuffer.empty[Option[Any]]
      (row \ "c").foreach { c =>
        val colIdx = colIndexOf((c \@ "r"))
        while (out.length < colIdx) out += None // gap cells are null
        val t = c \@ "t"
        val v = (c \ "v").headOption.map(_.text)
        val value: Option[Any] = t match {
          case "s" => v.map(i => shared(i.trim.toInt))
          case "str" => v
          case "inlineStr" => Some((c \ "is" \\ "t").map(_.text).mkString)
          case "b" => v.map(x => x.trim == "1")
          case "e" => None // error cells (#DIV/0!, #N/A, ...) surface as null
          case "d" =>
            // ISO-8601 typed date cells pass through IF they parse;
            // malformed content is null like any other bad cell
            v.flatMap { s =>
              val trimmed = s.trim
              val ok =
                scala.util.Try(java.time.LocalDateTime.parse(trimmed)).isSuccess ||
                scala.util.Try(java.time.LocalDate.parse(trimmed)).isSuccess
              if (ok) Some(trimmed.replace("T", " ")) else None
            }
          case _ =>
            // numeric; cells styled with a date number format (builtin
            // ids or custom date codes from styles.xml) convert their
            // serial to an ISO string, like the reference's pandas
            // read_excel path; an unparseable value in an unknown cell
            // type is null, never a whole-ingest failure
            val styleIdx = (c \@ "s").trim
            val isDate = styleIdx.nonEmpty &&
              styleIdx.toIntOption.exists(dateStyleIdx.contains)
            v.flatMap(s => s.trim.toDoubleOption)
              .map(d => if (isDate) serialToIso(d) else d)
        }
        out += value
      }
      out.toSeq
    }
  }

  /** OpenDocument: content.xml, first table; handles
    * number-columns-repeated and typed office:value attributes.
    */
  private[input] def readOdsCells(path: String): Seq[Seq[Option[Any]]] = {
    val content = zipEntries(path, Set("content.xml")).getOrElse("content.xml",
      throw new IllegalArgumentException(s"$path has no content.xml"))
    val xml = scala.xml.XML.loadString(new String(content, "UTF-8"))
    val table = (xml \\ "table").headOption.getOrElse(
      throw new IllegalArgumentException(s"$path has no table"))
    (table \ "table-row").map { row =>
      // Collect (value, repeat) groups first: writers pad row ends with
      // huge number-columns-repeated empty fillers (up to 16384) which
      // would otherwise inflate the inferred table width with all-null
      // columns — trailing empty groups are dropped BEFORE expansion.
      val groups = (row \ "table-cell").map { cell =>
        // ODS attributes are namespace-prefixed (table:, office:) — match
        // on local names.
        val repeat = cell.attributes.collectFirst {
          case a if a.key == "number-columns-repeated" => a.value.text.toInt
        }.getOrElse(1)
        val vt = cell.attributes.collectFirst {
          case a if a.key == "value-type" => a.value.text
        }.getOrElse("")
        val value: Option[Any] = vt match {
          case "float" | "percentage" | "currency" =>
            cell.attributes.collectFirst {
              case a if a.key == "value" => a.value.text
            }.flatMap(_.toDoubleOption)
          case "boolean" =>
            cell.attributes.collectFirst {
              case a if a.key == "boolean-value" => a.value.text == "true"
            }
          case "string" =>
            val t = (cell \\ "p").map(_.text).mkString
            if (t.isEmpty) None else Some(t)
          case "date" =>
            cell.attributes.collectFirst {
              case a if a.key == "date-value" => a.value.text.replace("T", " ")
            }
          case "time" =>
            cell.attributes.collectFirst {
              case a if a.key == "time-value" => a.value.text
            }
          case _ => None
        }
        (value, repeat)
      }
      val trimmed = groups.reverse.dropWhile(_._1.isEmpty).reverse
      val out = mutable.ArrayBuffer.empty[Option[Any]]
      trimmed.foreach { case (value, repeat) =>
        (0 until repeat).foreach(_ => out += value)
      }
      out.toSeq
    }.filter(_.nonEmpty)
  }

  /** Header row + type inference -> DataFrame. Inference per column over
    * the data rows: all-long -> LongType, all-numeric -> DoubleType,
    * all-boolean -> BooleanType, else StringType.
    */
  private[input] def toDataFrame(spark: SparkSession, cells: Seq[Seq[Option[Any]]]): DataFrame = {
    require(cells.nonEmpty, "empty sheet")
    val width = cells.map(_.length).max
    val padded = cells.map(r => r.padTo(width, None))
    val header = padded.head.zipWithIndex.map {
      case (Some(s), _) => s.toString
      case (None, i) => s"_c$i"
    }
    val dataRows = padded.tail
    def colVals(i: Int): Seq[Any] = dataRows.flatMap(_(i))
    val types: Seq[DataType] = (0 until width).map { i =>
      val vs = colVals(i)
      if (vs.isEmpty) StringType
      else if (vs.forall(_.isInstanceOf[Boolean])) BooleanType
      else if (vs.forall {
        case d: Double => d == math.rint(d) && math.abs(d) < 9.007199254740992e15
        case _ => false
      }) LongType
      else if (vs.forall(_.isInstanceOf[Double])) DoubleType
      else StringType
    }
    val schema = StructType(header.zip(types).map {
      case (n, t) => StructField(n, t, nullable = true)
    })
    val rows = dataRows.map { r =>
      Row.fromSeq(r.zip(types).map {
        case (Some(d: Double), LongType) => d.toLong
        case (Some(v), StringType) => v.toString
        case (Some(v), _) => v
        case (None, _) => null
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq,
        math.max(1, math.min(rows.size, spark.sparkContext.defaultParallelism))),
      schema)
  }

  /** "B7" -> 1 (letters only; 0-based column index). */
  private[input] def colIndexOf(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    math.max(0, acc - 1)
  }

  private def zipEntries(path: String, wanted: Set[String]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new FileInputStream(path))
    try {
      val out = mutable.Map.empty[String, Array[Byte]]
      var e: ZipEntry = zin.getNextEntry
      while (e != null && out.size < wanted.size) {
        if (wanted.contains(e.getName)) {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
          out(e.getName) = buf.toByteArray
        }
        e = zin.getNextEntry
      }
      out.toMap
    } finally zin.close()
  }

  // ------------------------------------------------------------------
  // writer (test fixtures + K-sink completeness)
  // ------------------------------------------------------------------

  /** Write a DataFrame (collected — spreadsheets are small by contract)
    * as a minimal standards-valid .xlsx: header row + typed cells.
    */
  def write(df: DataFrame, path: String): Unit = {
    val names = df.schema.fieldNames
    val rows = df.collect()
    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
      case s =>
        val esc = s.toString.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        s"""<c r="$ref" t="inlineStr"><is><t>$esc</t></is></c>"""
    }
    def colRef(i: Int): String = {
      var n = i + 1
      val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetRows = new StringBuilder
    sheetRows ++= "<row r=\"1\">"
    names.zipWithIndex.foreach { case (n, i) => sheetRows ++= cellXml(s"${colRef(i)}1", n) }
    sheetRows ++= "</row>"
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheetRows ++= s"""<row r="${ri + 2}">"""
      names.indices.foreach { ci =>
        sheetRows ++= cellXml(s"${colRef(ci)}${ri + 2}", r.get(ci))
      }
      sheetRows ++= "</row>"
    }
    val entries = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>$sheetRows</sheetData>
           |</worksheet>""".stripMargin
    )
    val zout = new ZipOutputStream(new FileOutputStream(path))
    try entries.foreach { case (name, content) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    } finally zout.close()
  }
}
