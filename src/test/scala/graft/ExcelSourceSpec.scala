package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._
import graft.ingest.Excel

/** S13 native .xlsx source (reference loads its mnemonic dimension with
  * pd.read_excel, telemetry_monitors.py:84): ZipInputStream + StAX parse,
  * exercised over writer round-trips, a hand-built shared-strings
  * workbook, DataFrame type inference, and a multi-file glob. */
class ExcelSourceSpec extends SparkSpec {

  private val header = Seq("mnemonic", "descr", "scale")
  private val rows: Seq[Seq[Any]] = Seq(
    Seq("LMMCETMP", "Mechanism temp", 1.5),
    Seq("LOSMLAMB", null, 2.0),
    Seq("LD2LMP", "Lamp current", null))

  test("writer/reader round-trip: strings, numbers, booleans, sparse cells") {
    val bytes = Excel.writeXlsx(Seq(
      ("mnemonics", header, rows),
      ("flags", Seq("name", "ok"), Seq(Seq("a", true), Seq("b", false)))))
    val s0 = Excel.parseSheet(bytes, 0)
    assert(s0.header == header)
    assert(s0.rows.map(_.toSeq) == Seq(
      Seq("LMMCETMP", "Mechanism temp", "1.5"),
      Seq("LOSMLAMB", null, "2.0"),
      Seq("LD2LMP", "Lamp current", null)))
    val s1 = Excel.parseSheet(bytes, 1)
    assert(s1.header == Seq("name", "ok"))
    assert(s1.rows.map(_.toSeq) == Seq(Seq("a", "true"), Seq("b", "false")))
    // 0-based sheet index out of range is an error, not silent sheet 0
    intercept[IllegalArgumentException](Excel.parseSheet(bytes, 2))
  }

  test("shared-string cells resolve through xl/sharedStrings.xml") {
    // hand-built workbook: cells use t="s" indices into a rich-text-split
    // shared string table (two <t> runs in one <si>), plus a t="str"
    // formula-result cell
    def entry(zip: ZipOutputStream, name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    val buf = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(buf)
    entry(zip, "xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry(zip, "xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry(zip, "xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3"><si><t>name</t></si><si><t>val</t></si><si><r><t>split </t></r><r><t>text</t></r></si></sst>""")
    entry(zip, "xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row><row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="str"><v>SUM()</v></c></row></sheetData></worksheet>""")
    zip.close()
    val s = Excel.parseSheet(buf.toByteArray, 0)
    assert(s.header == Seq("name", "val"))
    assert(s.rows.map(_.toSeq) == Seq(Seq("split text", "SUM()")))
  }

  test("readXlsx infers numeric columns and keeps strings") {
    val dir = Files.createTempDirectory("xlsx_read").toFile
    val f = new java.io.File(dir, "m.xlsx")
    Files.write(f.toPath, Excel.writeXlsx(Seq(("mnemonics", header, rows))))
    val df = Excel.readXlsx(spark, f.getAbsolutePath)
    assert(df.schema == StructType(Seq(
      StructField("mnemonic", StringType),
      StructField("descr", StringType),
      StructField("scale", DoubleType))))
    val got = df.collect().map(r => (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == Set(("LMMCETMP", "Mechanism temp", 1.5),
      ("LOSMLAMB", null, 2.0), ("LD2LMP", "Lamp current", null)))
  }

  test("date-styled cells surface as dates/timestamps via styles.xml") {
    import java.time.{LocalDate, LocalDateTime}
    val bytes = Excel.writeXlsx(Seq(("obs",
      Seq("prog", "start_date", "exp_start", "serial"),
      Seq(
        Seq("p15646", LocalDate.of(2024, 3, 1), LocalDateTime.of(2024, 3, 1, 13, 45, 30), 42.0),
        Seq("p15873", LocalDate.of(1999, 12, 31), LocalDateTime.of(1999, 12, 31, 0, 0, 1), 7.5)))))
    // parse level: serials with a date numFmt render as ISO strings;
    // unstyled numerics stay raw
    val s = Excel.parseSheet(bytes)
    assert(s.rows.map(_.toSeq) == Seq(
      Seq("p15646", "2024-03-01", "2024-03-01 13:45:30", "42.0"),
      Seq("p15873", "1999-12-31", "1999-12-31 00:00:01", "7.5")))
    // DataFrame level: DateType / TimestampType inference
    val dir = Files.createTempDirectory("xlsx_dates").toFile
    val f = new java.io.File(dir, "obs.xlsx")
    Files.write(f.toPath, bytes)
    val df = Excel.readXlsx(spark, f.getAbsolutePath)
    assert(df.schema == StructType(Seq(
      StructField("prog", StringType),
      StructField("start_date", DateType),
      StructField("exp_start", TimestampType),
      StructField("serial", DoubleType))))
    val got = df.collect().map(r => (r.getString(0), r.getDate(1).toString,
      r.getTimestamp(2).toLocalDateTime.toString)).toSet
    assert(got == Set(
      ("p15646", "2024-03-01", "2024-03-01T13:45:30"),
      ("p15873", "1999-12-31", "1999-12-31T00:00:01")))
  }

  test("custom numFmt codes classify date vs time vs plain number") {
    // hand-check the serial conversion boundaries too
    assert(Excel.serialToIso(45352.0, 'd') == "2024-03-01")
    assert(Excel.serialToIso(45352.573264, 'x')
      .startsWith("2024-03-01 13:45:3"))
    // time-only flavor: no fabricated epoch date
    assert(Excel.serialToIso(45352.5, 't') == "12:00:00")
    assert(Excel.serialToIso(0.75, 't') == "18:00:00")
    // elapsed flavor: unbounded hours, no mod-24 wrap
    assert(Excel.serialToIso(1.5, 'e') == "36:00:00")
    // date flavor floors — a fraction near midnight stays on its day
    assert(Excel.serialToIso(45352.999995, 'd') == "2024-03-01")
    // day 25569 is the unix epoch
    assert(Excel.serialToIso(25569.0, 'd') == "1970-01-01")

    // hand-built workbook with CUSTOM formats: a date code, an elapsed-time
    // code (serial 1.5 -> 36 unbounded hours), a plain numeric code with
    // quoted date letters ("days"), and a currency-ish bracket code —
    // only the first two may convert
    def entry(zip: ZipOutputStream, name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    val buf = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(buf)
    entry(zip, "xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry(zip, "xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry(zip, "xl/styles.xml",
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<numFmts count="4"><numFmt numFmtId="164" formatCode="yyyy\-mm"/><numFmt numFmtId="165" formatCode="[h]:mm:ss"/><numFmt numFmtId="166" formatCode="0.00&quot;days&quot;"/><numFmt numFmtId="167" formatCode="[$USD] 0.00"/></numFmts>""" +
        """<cellXfs count="5"><xf numFmtId="0"/><xf numFmtId="164"/><xf numFmtId="165"/><xf numFmtId="166"/><xf numFmtId="167"/></cellXfs></styleSheet>""")
    entry(zip, "xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c><c r="B1" t="inlineStr"><is><t>b</t></is></c><c r="C1" t="inlineStr"><is><t>c</t></is></c><c r="D1" t="inlineStr"><is><t>d</t></is></c></row>""" +
        """<row r="2"><c r="A2" s="1"><v>45352</v></c><c r="B2" s="2"><v>1.5</v></c><c r="C2" s="3"><v>3.25</v></c><c r="D2" s="4"><v>19.99</v></c></row>""" +
        """</sheetData></worksheet>""")
    zip.close()
    val s = Excel.parseSheet(buf.toByteArray, 0)
    assert(s.rows.map(_.toSeq) == Seq(
      // custom date → ISO date; custom elapsed time → datetime; the
      // quoted-"days" and [$USD] codes stay raw numbers
      Seq("2024-03-01", "36:00:00", "3.25", "19.99")))
  }

  test("glob read unions matching workbooks, one task per file") {
    val dir = Files.createTempDirectory("xlsx_glob").toFile
    Files.write(new java.io.File(dir, "a.xlsx").toPath,
      Excel.writeXlsx(Seq(("s", Seq("k", "v"), Seq(Seq("a", 1.0))))))
    Files.write(new java.io.File(dir, "b.xlsx").toPath,
      Excel.writeXlsx(Seq(("s", Seq("k", "v"), Seq(Seq("b", 2.0), Seq("c", 3.0))))))
    val df = Excel.readXlsx(spark, dir.getAbsolutePath + "/*.xlsx")
    assert(df.rdd.getNumPartitions == 2)
    assert(df.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set(("a", 1.0), ("b", 2.0), ("c", 3.0)))
    // mismatched header fails loudly, not silently misaligned
    Files.write(new java.io.File(dir, "c.xlsx").toPath,
      Excel.writeXlsx(Seq(("s", Seq("other", "v"), Seq(Seq("x", 9.0))))))
    val err = intercept[org.apache.spark.SparkException] {
      Excel.readXlsx(spark, dir.getAbsolutePath + "/*.xlsx").collect()
    }
    assert(err.getMessage.contains("differs from probe header") ||
      Option(err.getCause).exists(_.getMessage.contains("differs from probe header")))
  }

  // ---- legacy .xls (BIFF8/OLE2) — golden reads over the reference's OWN
  // mnemonic workbook (cosmo/telemetry_support/COSMnemonics.xls, the file
  // telemetry_monitors.py:84 feeds pd.read_excel), same pattern as the
  // FITS golden-bytes specs. Pinned values were cross-derived with an
  // independent record-level parse of the file.

  private val xlsPath = "/root/reference/cosmo/telemetry_support/COSMnemonics.xls"
  private def xlsBytes = Files.readAllBytes(java.nio.file.Paths.get(xlsPath))

  test(".xls golden read: sheet 0 header, shape, and cell classes") {
    assume(new java.io.File(xlsPath).exists())
    val s = Excel.parseSheet(xlsBytes, 0)
    // date-styled MULRK header cells render as ISO dates (ixfe→ifmt 14),
    // missing header cells take positional names
    assert(s.header == Seq("DM-02 Page", "Mnemonic", "Description",
      "Sample Period", "Bits", "Component", "_c6",
      "2009-06-13", "2009-11-30", "2010-01-27", "_c10", "Monthly plots", "Page"))
    // 267 sheet rows with two fully-empty rows absent (264, 265): header
    // + 264 data rows survive, empty rows don't fabricate null rows
    assert(s.rows.length == 264)
    // LABELSST strings + RK/MULRK numbers in canonical form ("30" not 30.0)
    assert(s.rows.head.toSeq == Seq("16", "L15VHLD1",
      "LVPS1 +15V Hold Converter Voltage", "30", "8", "LVPS",
      null, null, null, null, null, "x", "249250"))
    // this description is the SST string split across the CONTINUE record
    // boundary — the grbit-per-part re-read path
    val dce = s.rows.find(r => r(1) == "LDCHVMNA").get
    assert(dce.toSeq == Seq("23", "LDCHVMNA",
      "DCE HV Output Voltage Monitor A", "30", "8", "DVA",
      null, null, "x", "x", null, "x", null))
  }

  test(".xls golden read: sheet 1 resolves through BOUNDSHEET order") {
    assume(new java.io.File(xlsPath).exists())
    val s = Excel.parseSheet(xlsBytes, 1)
    assert(s.header.head == "Possibly Useful telemetry items")
    assert(s.header.length == 8)
    assert(s.rows.length == 76)
    assert(s.rows.head.head == "Included in Chris Long's telemetry deliveries:")
    intercept[IllegalArgumentException](Excel.parseSheet(xlsBytes, 2))
  }

  test(".xls reads through readXlsx with type inference, like .xlsx") {
    assume(new java.io.File(xlsPath).exists())
    val df = Excel.readXlsx(spark, xlsPath)
    assert(df.count() == 264)
    assert(df.schema.fields.length == 13)
    // numeric RK/MULRK columns infer Double; mnemonic strings stay strings
    assert(df.schema("Sample Period").dataType == DoubleType)
    assert(df.schema("Mnemonic").dataType == StringType)
    val r = df.filter(df("Mnemonic") === "L15VHLD1").collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("Description") == "LVPS1 +15V Hold Converter Voltage")
    assert(r.head.getAs[Double]("Sample Period") == 30.0)
  }

  test("RK decode: 30-bit int, x100 scaling, truncated-double forms") {
    import graft.ingest.Biff
    // int form: value<<2 | fInt
    assert(Biff.rkValue((30L << 2) | 2L) == 30.0)
    // negative 30-bit int
    assert(Biff.rkValue((((-7L) & 0x3fffffffL) << 2) | 2L) == -7.0)
    // int/100 form
    assert(Biff.rkValue((1234L << 2) | 3L) == 12.34)
    // double form: top 34 bits of the IEEE encoding
    val bits = java.lang.Double.doubleToLongBits(1.5)
    assert(Biff.rkValue((bits >>> 34) << 2) == 1.5)
    // double/100
    assert(Biff.rkValue(((bits >>> 34) << 2) | 1L) == 0.015)
  }

  test("unrecognized workbook magic raises a clear format error") {
    val err = intercept[IllegalArgumentException](
      Excel.parseSheet("not a workbook at all".getBytes("UTF-8")))
    assert(err.getMessage.contains("unrecognized workbook format"))
  }

  test("1904 date system shifts date serials (xlsx workbookPr + serialToIso)") {
    // serial 100 = 1900-04-09 in the default system, 1904-04-10 in 1904
    assert(Excel.serialToIso(100.0, 'd') == "1900-04-09")
    assert(Excel.serialToIso(100.0, 'd', date1904 = true) == "1904-04-10")
    assert(Excel.serialToIso(100.5, 'x', date1904 = true) == "1904-04-10 12:00:00")
    // time-of-day and elapsed flavors carry no epoch — unaffected
    assert(Excel.serialToIso(0.5, 't', date1904 = true) == "12:00:00")
    // negative elapsed keeps its sign below one hour
    assert(Excel.serialToIso(-30.0 / 86400.0, 'e') == "-0:00:30")
    assert(Excel.serialToIso(1.5, 'e') == "36:00:00")
    // end-to-end: a writeXlsx workbook patched to declare date1904 reads
    // its date cells shifted
    val base = Excel.writeXlsx(Seq(("s", Seq("d"),
      Seq(Seq(java.time.LocalDate.of(2009, 6, 13))))))
    def patched(bytes: Array[Byte]): Array[Byte] = {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new ByteArrayOutputStream()
      val zout = new ZipOutputStream(buf)
      var e = zin.getNextEntry
      while (e != null) {
        val content = zin.readAllBytes()
        zout.putNextEntry(new ZipEntry(e.getName))
        zout.write(
          if (e.getName == "xl/workbook.xml")
            new String(content, "UTF-8").replace("<sheets>",
              """<workbookPr date1904="1"/><sheets>""").getBytes("UTF-8")
          else content)
        zout.closeEntry()
        e = zin.getNextEntry
      }
      zout.close()
      buf.toByteArray
    }
    assert(Excel.parseSheet(base, 0).rows.head.head == "2009-06-13")
    // same serial, 1904 epoch: 1462 days later
    assert(Excel.parseSheet(patched(base), 0).rows.head.head == "2013-06-14")
  }
}
