package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S13: native Excel (.xlsx) source — the reference loads its telemetry
  * mnemonic dimension with `pd.read_excel(mnemonics_file, sheet_name=0)`
  * (cosmo/monitors/telemetry_monitors.py:84). XLSX is ZIP + SpreadsheetML,
  * so a zero-dependency JDK parse (ZipInputStream + StAX) covers it: the
  * workbook's sheet order resolves through xl/workbook.xml and its .rels,
  * cell text through xl/sharedStrings.xml, and the sheet grid through
  * sparse `<c r="B3" t="...">` cells.
  *
  * Scale posture: spreadsheets are small dimension tables by construction
  * (the format holds one zip in memory; the reference's is a mnemonic
  * list). The read is still distributed — one task per matched file via
  * the binaryFile source, schema probed from ONE file on the driver — and
  * the result is broadcast-join-sized by nature. Bulk facts belong in
  * parquet; this source exists so a user can point at the same .xlsx the
  * reference consumes.
  */
object Excel {

  /** One parsed sheet: header row + data rows as raw cell strings (null =
    * missing cell), plus per-column "every non-null cell parses as a
    * number" flags from this file (used for type inference). */
  final case class Sheet(header: Seq[String], rows: Seq[Array[String]])

  private def factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // no DTDs / external entities: untrusted workbook bytes must not
    // trigger any fetch or entity expansion
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    f
  }

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map[String, Array[Byte]]()
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = zin.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = zin.read(tmp) }
          out(e.getName) = buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  /** Sheet paths in workbook order: xl/workbook.xml lists `<sheet>`s with
    * r:id refs; xl/_rels/workbook.xml.rels maps each Id to its target. */
  private def sheetPaths(entries: Map[String, Array[Byte]]): Seq[String] = {
    val rels = entries.get("xl/_rels/workbook.xml.rels").map { b =>
      val r = factory.createXMLStreamReader(new ByteArrayInputStream(b))
      val m = mutable.Map[String, String]()
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship") {
            val id = r.getAttributeValue(null, "Id")
            val target = r.getAttributeValue(null, "Target")
            if (id != null && target != null) m(id) = target
          }
        }
      } finally r.close()
      m.toMap
    }.getOrElse(Map.empty)
    val wb = entries.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: no xl/workbook.xml"))
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(wb))
    val ids = mutable.ArrayBuffer[String]()
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet") {
          // the r:id attribute lives in the officeDocument relationships
          // namespace; match by local name to stay prefix-agnostic
          var rid: String = null
          var i = 0
          while (i < r.getAttributeCount) {
            if (r.getAttributeLocalName(i) == "id") rid = r.getAttributeValue(i)
            i += 1
          }
          if (rid != null) ids += rid
        }
      }
    } finally r.close()
    ids.toSeq.map { rid =>
      val t = rels.getOrElse(rid, s"worksheets/sheet${ids.indexOf(rid) + 1}.xml")
      if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t"
    }
  }

  /** 1904 date system flag: `<workbookPr date1904="1"/>` (or "true") in
    * xl/workbook.xml — classic-Mac workbooks; shifts every date serial. */
  private def isDate1904(entries: Map[String, Array[Byte]]): Boolean =
    entries.get("xl/workbook.xml").exists { b =>
      val r = factory.createXMLStreamReader(new ByteArrayInputStream(b))
      try {
        var found = false
        while (r.hasNext && !found) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "workbookPr") {
            val v = r.getAttributeValue(null, "date1904")
            found = v == "1" || v == "true"
          }
        }
        found
      } finally r.close()
    }

  /** sharedStrings.xml: the i-th `<si>` is the text for shared index i
    * (concatenating all nested `<t>` runs — rich text splits one string
    * across several). */
  private def sharedStrings(entries: Map[String, Array[Byte]]): IndexedSeq[String] =
    entries.get("xl/sharedStrings.xml").map { b =>
      val r = factory.createXMLStreamReader(new ByteArrayInputStream(b))
      val out = mutable.ArrayBuffer[String]()
      val cur = new StringBuilder
      var inSi = false
      var inT = false
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "si" => inSi = true; cur.clear()
                case "t" if inSi => inT = true
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
              if (inT) cur.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "si" => inSi = false; out += cur.toString
                case "t" => inT = false
                case _ =>
              }
            case _ =>
          }
        }
      } finally r.close()
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** Style classification from xl/styles.xml: for each cellXfs index
    * whose number format is temporal, its flavor — 'd' date-only,
    * 't' time-only (no fabricated epoch date), 'x' datetime. Built-in
    * numFmtIds 14–17 are dates, 18–21 and 45–47 times, 22 datetime;
    * custom formats are classified by their format code (date tokens
    * y/d vs time tokens h/s/AM-PM, outside quoted literals and []
    * sections — 'm' alone is ambiguous between month and minute, so it
    * never decides by itself). */
  private def dateStyles(entries: Map[String, Array[Byte]]): Map[Int, Char] =
    entries.get("xl/styles.xml").map { b =>
      val r = factory.createXMLStreamReader(new ByteArrayInputStream(b))
      val customFmts = mutable.Map[Int, String]()
      val xfFmtIds = mutable.ArrayBuffer[Int]()
      var inCellXfs = false
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "numFmt" =>
                  val id = r.getAttributeValue(null, "numFmtId")
                  val code = r.getAttributeValue(null, "formatCode")
                  if (id != null && code != null) customFmts(id.toInt) = code
                case "cellXfs" => inCellXfs = true
                case "xf" if inCellXfs =>
                  val id = r.getAttributeValue(null, "numFmtId")
                  xfFmtIds += (if (id == null) 0 else id.toInt)
                case _ =>
              }
            case XMLStreamConstants.END_ELEMENT =>
              if (r.getLocalName == "cellXfs") inCellXfs = false
            case _ =>
          }
        }
      } finally r.close()

      xfFmtIds.zipWithIndex.flatMap { case (fmtId, xfIdx) =>
        fmtFlavor(fmtId, customFmts.toMap).map(xfIdx -> _)
      }.toMap
    }.getOrElse(Map.empty)

  /** Temporal flavor of one number format id — shared by the .xlsx styles
    * path above and the BIFF8 XF/FORMAT path ([[Biff]]): 'd' date-only,
    * 't' time-of-day, 'x' datetime, 'e' elapsed duration; None = plain
    * number. Built-in ids per the SpreadsheetML spec; custom codes are
    * classified by their tokens (outside quoted literals and [] sections;
    * 'm' alone never decides — it is ambiguous between month and minute). */
  private[ingest] def fmtFlavor(fmtId: Int,
                                customFmts: Map[Int, String]): Option[Char] = {
    def strip(code: String): String =
      code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
        .replaceAll("\\\\.", "")
    val elapsedRe = "(?i)\\[(h+|m+|s+)\\]".r
    fmtId match {
      case i if i >= 14 && i <= 17 => Some('d')  // dates
      case i if i >= 18 && i <= 21 => Some('t')  // times of day
      case 22 => Some('x')                       // m/d/yy h:mm
      case 45 | 47 => Some('t')                  // mm:ss displays
      case 46 => Some('e')                       // [h]:mm:ss elapsed
      case i => customFmts.get(i).flatMap { c =>
        // bracketed h/m/s sections mean ELAPSED duration — check before
        // strip() removes the brackets
        if (elapsedRe.findFirstIn(c).isDefined) Some('e')
        else {
          val s = strip(c).toLowerCase
          val time = s.exists(ch => ch == 'h' || ch == 's') || s.contains("am/pm")
          val date = s.exists(ch => ch == 'y' || ch == 'd')
          if (date && time) Some('x')
          else if (date) Some('d')
          else if (time) Some('t')
          else None
        }
      }
    }
  }

  /** Serial-day → ISO string. Excel day 0 is 1899-12-30 (the 1900-leap-bug
    * epoch every modern reader uses; serials below 61 — pre-March-1900 —
    * inherit the historical one-day ambiguity and are out of scope).
    * Workbooks saved in the 1904 date system (`<workbookPr date1904="1"/>`,
    * the classic-Mac default) shift day 0 to 1904-01-01: `date1904 = true`
    * adds the 1,462-day epoch gap before conversion for date-bearing
    * flavors ('d'/'x'); time-of-day ('t') and elapsed ('e') cells carry no
    * epoch and are unaffected.
    * `flavor` 'd' renders `yyyy-MM-dd` (from the FLOOR of the serial —
    * a date cell's time fraction must not round it into the next day),
    * 'x' `yyyy-MM-dd HH:mm:ss`, 't' (time-of-day formats) `HH:mm:ss`
    * from the fractional day with no fabricated epoch date, and 'e'
    * (elapsed [h]-style formats) unbounded `H:mm:ss` — 1.5 days is
    * `36:00:00`, not wrapped mod 24. Time fractions round to the
    * second. */
  private[graft] def serialToIso(serial: Double, flavor: Char,
                                 date1904: Boolean = false): String =
    flavor match {
      case 't' =>
        val s = math.round(serial * 86400.0) % 86400L
        val t = if (s < 0) s + 86400L else s
        "%02d:%02d:%02d".format(t / 3600, t / 60 % 60, t % 60)
      case 'e' =>
        // sign carried explicitly: "%d" of the hours field alone would
        // render -30 s as "0:00:30" (the minus vanishes below one hour)
        val s0 = math.round(serial * 86400.0)
        val s = math.abs(s0)
        (if (s0 < 0) "-" else "") +
          "%d:%02d:%02d".format(s / 3600, s / 60 % 60, s % 60)
      case 'd' =>
        val adj = if (date1904) serial + 1462.0 else serial
        val d = java.time.LocalDate.ofEpochDay(math.floor(adj).toLong - 25569L)
        "%04d-%02d-%02d".format(d.getYear, d.getMonthValue, d.getDayOfMonth)
      case _ =>
        val adj = if (date1904) serial + 1462.0 else serial
        val secs = math.round(adj * 86400.0) - 25569L * 86400L
        val dt = java.time.LocalDateTime.ofEpochSecond(secs, 0,
          java.time.ZoneOffset.UTC)
        "%04d-%02d-%02d %02d:%02d:%02d".format(dt.getYear, dt.getMonthValue,
          dt.getDayOfMonth, dt.getHour, dt.getMinute, dt.getSecond)
    }

  /** "B3" → column 1 (letters are bijective base-26). */
  private[ingest] def colIndex(ref: String): Int = {
    var i = 0; var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  /** Parse the `sheet`-th worksheet (0-based, workbook order) of one
    * workbook's bytes into header + rows. First row = header (pandas
    * `read_excel` default); missing cells are null; all values surface as
    * their raw cell strings (numbers in canonical xlsx form, booleans as
    * "true"/"false").
    *
    * Dispatches on the file magic: ZIP ("PK") → this SpreadsheetML parse;
    * OLE2 (d0cf11e0) → the [[Biff]] `.xls` parse (same Sheet contract, so
    * every consumer — readXlsx included — is format-agnostic); anything
    * else → a clear unsupported-format error. */
  def parseSheet(bytes: Array[Byte], sheet: Int = 0): Sheet = {
    if (Biff.isOle2(bytes)) return Biff.parseSheet(bytes, sheet)
    require(bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == 'K'.toByte,
      "unrecognized workbook format: expected .xlsx (ZIP magic 'PK') or " +
        "legacy .xls (OLE2 magic d0cf11e0); got " +
        bytes.take(4).map("%02x".format(_)).mkString)
    val entries = zipEntries(bytes)
    val paths = sheetPaths(entries)
    require(sheet >= 0 && sheet < paths.length,
      s"sheet $sheet out of range: workbook has ${paths.length} sheet(s)")
    val strings = sharedStrings(entries)
    val dateXfs = dateStyles(entries)
    val date1904 = isDate1904(entries)
    val data = entries.getOrElse(paths(sheet),
      throw new IllegalArgumentException(s"missing worksheet part ${paths(sheet)}"))

    val r = factory.createXMLStreamReader(new ByteArrayInputStream(data))
    val rows = mutable.ArrayBuffer[mutable.ArrayBuffer[(Int, String)]]()
    var cells: mutable.ArrayBuffer[(Int, String)] = null
    var cellCol = -1
    var cellType = "n"
    var cellStyle = -1
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    var maxCol = -1
    try {
      // jobs-bound: 0 Spark jobs — task-local XML stream parse of one
      // workbook's bytes (runs inside a single task, no actions)
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => cells = mutable.ArrayBuffer[(Int, String)]()
              case "c" if cells != null =>
                val ref = r.getAttributeValue(null, "r")
                // no r attribute → next column after the previous cell
                cellCol = if (ref != null) colIndex(ref)
                          else cells.lastOption.map(_._1 + 1).getOrElse(0)
                val t = r.getAttributeValue(null, "t")
                cellType = if (t == null) "n" else t
                val s = r.getAttributeValue(null, "s")
                cellStyle = if (s == null) -1 else s.trim.toInt
                text.clear()
              case "v" => inV = true
              case "t" if cellType == "inlineStr" => inIsT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV || inIsT) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "c" if cells != null && cellCol >= 0 =>
                val raw = text.toString
                val value = cellType match {
                  case "s" =>
                    val i = raw.trim.toInt
                    if (i >= 0 && i < strings.length) strings(i) else null
                  case "b" => if (raw.trim == "1") "true" else "false"
                  case "n" if raw.nonEmpty && dateXfs.contains(cellStyle) &&
                      raw.trim.toDoubleOption.isDefined =>
                    // date-styled numeric cell: surface the serial as an
                    // ISO string (pandas read_excel parity) instead of the
                    // raw serial number
                    serialToIso(raw.trim.toDouble, dateXfs(cellStyle), date1904)
                  case _ => if (raw.isEmpty && cellType != "str" &&
                                cellType != "inlineStr") null else raw
                }
                if (value != null) {
                  cells += ((cellCol, value))
                  if (cellCol > maxCol) maxCol = cellCol
                }
                cellCol = -1
              case "row" =>
                if (cells != null && cells.nonEmpty) rows += cells
                cells = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()

    if (rows.isEmpty) return Sheet(Seq.empty, Seq.empty)
    val width = maxCol + 1
    def dense(cs: mutable.ArrayBuffer[(Int, String)]): Array[String] = {
      val a = new Array[String](width)
      cs.foreach { case (i, v) => if (i < width) a(i) = v }
      a
    }
    val headerCells = dense(rows.head)
    val header = headerCells.zipWithIndex.map { case (h, i) =>
      if (h == null || h.isEmpty) s"_c$i" else h
    }.toSeq
    Sheet(header, rows.tail.map(dense).toSeq)
  }

  /** Read Excel file(s) — .xlsx or legacy .xls (BIFF8/OLE2, via [[Biff]])
    * in any mix — into a DataFrame. `path` may be a glob; every
    * matched workbook must share the probe file's header. Columns are
    * StringType, or DoubleType when `inferTypes` and every non-null cell
    * of the probe file's column parses numerically (casts applied in the
    * plan, so they stay inside codegen).
    *
    * Distribution contract: binaryFile source → one partition per file;
    * the driver reads ONE file to fix the schema (same bounded probe as
    * the FITS source); per-file parse runs in executors.
    *
    * PROBE-FILE TYPE CONTRACT: Double/Timestamp/Date columns are inferred
    * from the FIRST matched file only. In a multi-file glob, a cell in a
    * NON-probe file that does not parse as the inferred type surfaces as
    * null (the cast is a plan-level `cast`, which is non-throwing by SQL
    * semantics) — identical to how Spark's csv/json sources treat
    * malformed values under the default permissive mode. Pass
    * `inferTypes = false` to get every column as its raw string when the
    * glob's files are not type-homogeneous. */
  def readXlsx(spark: SparkSession, path: String, sheet: Int = 0,
               inferTypes: Boolean = true): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
    val probeBytes = bin.map(_._2).head()
    val probe = parseSheet(probeBytes, sheet)
    require(probe.header.nonEmpty, s"empty worksheet in $path")
    val header = probe.header
    val dateRe = "\\d{4}-\\d{2}-\\d{2}".r
    val tsRe = "\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}".r
    // per-column target type from the probe file: Double when every
    // non-null cell parses numerically; Date/Timestamp when every
    // non-null cell is an ISO string from a date-styled serial
    val colType: Seq[DataType] = header.indices.map { i =>
      val vals = probe.rows.flatMap(r => Option(r(i)))
      if (!inferTypes || vals.isEmpty) StringType
      else if (vals.forall(v => v.toDoubleOption.isDefined)) DoubleType
      else if (vals.forall(v => tsRe.matches(v))) TimestampType
      else if (vals.forall(v => dateRe.matches(v))) DateType
      else StringType
    }

    val rawSchema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(rawSchema)
    val width = header.length
    val hdr = header
    val raw = bin.mapPartitions { files =>
      files.flatMap { case (p, bytes) =>
        val s = parseSheet(bytes, sheet)
        require(s.header == hdr,
          s"workbook $p header ${s.header} differs from probe header $hdr")
        s.rows.map { cells =>
          Row.fromSeq(Seq.tabulate(width)(i => if (i < cells.length) cells(i) else null))
        }
      }
    }(enc)
    raw.select(header.zipWithIndex.map { case (h, i) =>
      if (colType(i) == StringType) col(h) else col(h).cast(colType(i)).as(h)
    }: _*)
  }

  /** Minimal .xlsx writer (inline-string cells, one canonical number form)
    * — the sink side of S13 and the round-trip harness for the reader.
    * Accepts several sheets; `rows` cells may be String, Boolean, or any
    * Number (null → omitted cell, exercising sparse-row reads). */
  def writeXlsx(sheets: Seq[(String, Seq[String], Seq[Seq[Any]])]): Array[Byte] = {
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    // date/datetime cells: serial day number + a date-styled cellXf (s=1
    // is numFmtId 14 date-only, s=2 is numFmtId 22 datetime — see the
    // styles.xml part below); epoch 1899-12-30 mirrors serialToIso
    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case d: java.time.LocalDate =>
        s"""<c r="$ref" s="1"><v>${d.toEpochDay + 25569L}</v></c>"""
      case dt: java.time.LocalDateTime =>
        val serial = dt.toEpochSecond(java.time.ZoneOffset.UTC) / 86400.0 + 25569.0
        s"""<c r="$ref" s="2"><v>$serial</v></c>"""
      case ts: java.sql.Timestamp =>
        cellXml(ref, ts.toLocalDateTime)
      case n: Number => s"""<c r="$ref"><v>${n.toString}</v></c>"""
      case s => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s.toString)}</t></is></c>"""
    }
    def sheetXml(header: Seq[String], rows: Seq[Seq[Any]]): String = {
      val all = header.map(h => h: Any) +: rows
      val body = all.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex
          .map { case (v, ci) => cellXml(s"${colRef(ci)}${ri + 1}", v) }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
    }
    val sheetTags = sheets.zipWithIndex.map { case ((name, _, _), i) =>
      s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetTags</sheets></workbook>"""
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs></styleSheet>"""
    val relTags = (sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    } :+ s"""<Relationship Id="rId${sheets.length + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""").mkString
    val wbRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$relTags</Relationships>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
        sheets.indices.map { i =>
          s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
        }.mkString + "</Types>"

    val buf = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(buf)
    def put(name: String, content: String): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L) // deterministic bytes: zip timestamps pinned
      zip.putNextEntry(e)
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    put("[Content_Types].xml", contentTypes)
    put("_rels/.rels", rootRels)
    put("xl/workbook.xml", workbook)
    put("xl/_rels/workbook.xml.rels", wbRels)
    put("xl/styles.xml", styles)
    sheets.zipWithIndex.foreach { case ((_, header, rows), i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(header, rows))
    }
    zip.close()
    buf.toByteArray
  }
}
