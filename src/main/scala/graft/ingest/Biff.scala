package graft.ingest

import scala.collection.mutable

/** S13 (legacy half): native BIFF8 `.xls` reader — the reference's actual
  * mnemonic workbook is OLD-format Excel (cosmo/telemetry_support/
  * COSMnemonics.xls is an OLE2 compound file, magic d0cf11e0, consumed at
  * cosmo/monitors/telemetry_monitors.py:84 via `pd.read_excel`), so a
  * user pointing this engine at the reference's own file must get a
  * parse, not an error. Zero dependencies, like the .xlsx half: the OLE2
  * container (FAT/DIFAT/miniFAT sector chains + directory) yields the
  * `Workbook` stream, and the BIFF8 record walk yields sheets and cells.
  *
  * Coverage is the subset a data workbook uses — the exact record set in
  * the reference file (LABELSST, RK, MULRK, SST with CONTINUE spans)
  * plus NUMBER, LABEL, BOOLERR, numeric/bool FORMULA cached values, XF/
  * FORMAT date-style classification (shared with the .xlsx reader) and
  * DATE1904. Charts, rich-text runs (text kept, formatting dropped),
  * encryption (FILEPASS) and BIFF5 single-byte strings are out of scope;
  * encrypted workbooks raise a clear error.
  *
  * Values surface exactly like the .xlsx reader's: raw strings, numbers
  * in canonical form (integral doubles render bare, "30" not "30.0"),
  * booleans "true"/"false", date-styled serials as ISO strings — so
  * [[Excel.readXlsx]]'s schema inference and downstream behavior are
  * format-agnostic.
  */
object Biff {

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def u16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    u16(b, o) | (u16(b, o + 2) << 16)
  private def u32(b: Array[Byte], o: Int): Long = i32(b, o) & 0xffffffffL

  private[ingest] def isOle2(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes.take(8).map(_ & 0xff).toSeq ==
        Seq(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1))

  // ---- OLE2 compound file ------------------------------------------------

  /** The named stream's bytes (first match wins), resolving regular FAT
    * chains, the DIFAT overflow chain, and the mini stream for streams
    * under the cutoff. */
  private def oleStream(bytes: Array[Byte], names: Seq[String]): Array[Byte] = {
    require(isOle2(bytes), "not an OLE2 compound file")
    val ssz = 1 << u16(bytes, 30)
    val mssz = 1 << u16(bytes, 32)
    val nFat = i32(bytes, 44)
    val dirStart = i32(bytes, 48)
    val miniCutoff = u32(bytes, 56)
    val miniFatStart = i32(bytes, 60)
    val difStart = i32(bytes, 68)
    val nDif = i32(bytes, 72)

    def sector(i: Int): Array[Byte] = {
      val off = 512 + i * ssz
      java.util.Arrays.copyOfRange(bytes, off, math.min(off + ssz, bytes.length))
    }

    // FAT sector list: 109 header entries + DIFAT overflow sectors (each
    // holds ssz/4 - 1 entries and a pointer to the next DIFAT sector)
    val fatSecs = mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < 109) {
      val s = i32(bytes, 76 + 4 * i)
      if (s >= 0) fatSecs += s
      i += 1
    }
    var dif = difStart
    var difSeen = 0
    while (dif >= 0 && difSeen < nDif) {
      val d = sector(dif)
      var j = 0
      while (j < ssz / 4 - 1) {
        val s = i32(d, 4 * j)
        if (s >= 0) fatSecs += s
        j += 1
      }
      dif = i32(d, ssz - 4)
      difSeen += 1
    }
    val fat = fatSecs.toArray.flatMap { s =>
      val d = sector(s)
      Array.tabulate(ssz / 4)(j => i32(d, 4 * j))
    }

    def chain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s >= 0 && guard <= fat.length) {
        out.write(sector(s))
        s = if (s < fat.length) fat(s) else -2
        guard += 1
      }
      val a = out.toByteArray
      if (size >= 0 && size < a.length) java.util.Arrays.copyOf(a, size.toInt) else a
    }

    // directory entries: 128 bytes each across the directory chain
    val dirData = chain(dirStart, -1L)
    final case class Entry(name: String, typ: Int, start: Int, size: Long)
    val entries = (0 until dirData.length / 128).flatMap { k =>
      val off = k * 128
      val nlen = u16(dirData, off + 64)
      if (nlen < 2) None
      else Some(Entry(
        new String(dirData, off, nlen - 2, java.nio.charset.StandardCharsets.UTF_16LE),
        u8(dirData, off + 66), i32(dirData, off + 116), u32(dirData, off + 120)))
    }
    val root = entries.find(_.typ == 5).getOrElse(
      throw new IllegalArgumentException("OLE2 file has no root directory entry"))
    val target = names.iterator.flatMap(n => entries.find(e => e.typ == 2 && e.name == n))
      .nextOption().getOrElse(throw new IllegalArgumentException(
        s"OLE2 file has no ${names.mkString("/")} stream — not an Excel workbook?"))

    if (target.size >= miniCutoff) chain(target.start, target.size)
    else {
      // mini stream: sectors of mssz bytes inside the root entry's chain,
      // linked by the miniFAT (its own regular-FAT chain)
      val miniStream = chain(root.start, root.size)
      val miniFatData = chain(miniFatStart, -1L)
      val miniFat = Array.tabulate(miniFatData.length / 4)(j => i32(miniFatData, 4 * j))
      val out = new java.io.ByteArrayOutputStream()
      var s = target.start
      var guard = 0
      while (s >= 0 && guard <= miniFat.length) {
        val off = s * mssz
        out.write(java.util.Arrays.copyOfRange(miniStream, off,
          math.min(off + mssz, miniStream.length)))
        s = if (s < miniFat.length) miniFat(s) else -2
        guard += 1
      }
      val a = out.toByteArray
      if (target.size < a.length) java.util.Arrays.copyOf(a, target.size.toInt) else a
    }
  }

  // ---- BIFF8 record stream ----------------------------------------------

  private final val RT_BOF = 0x809
  private final val RT_EOF = 0x0a
  private final val RT_CONTINUE = 0x3c
  private final val RT_SST = 0xfc
  private final val RT_BOUNDSHEET = 0x85
  private final val RT_XF = 0xe0
  private final val RT_FORMAT = 0x41e
  private final val RT_DATE1904 = 0x22
  private final val RT_FILEPASS = 0x2f
  private final val RT_LABELSST = 0xfd
  private final val RT_NUMBER = 0x203
  private final val RT_RK = 0x27e
  private final val RT_MULRK = 0xbd
  private final val RT_LABEL = 0x204
  private final val RT_BOOLERR = 0x205
  private final val RT_FORMULA = 0x06
  private final val RT_STRING = 0x207

  /** Reader over the SST record's payload plus its CONTINUE payloads.
    * Fixed-width fields and run/ext skips advance across part boundaries
    * transparently (the format never splits a string HEADER across
    * records); character data re-reads the per-part grbit byte at each
    * boundary — a split string may switch between compressed and UTF-16
    * halves, which is exactly what the flags-per-part encoding is for. */
  private final class PartsReader(parts: IndexedSeq[Array[Byte]]) {
    private var pi = 0
    private var po = 0
    private def ensure(): Unit = {
      while (pi < parts.length && po >= parts(pi).length) { pi += 1; po = 0 }
      if (pi >= parts.length)
        throw new IllegalArgumentException("truncated SST: ran past last CONTINUE")
    }
    private def remainingInPart: Int = {
      // do not advance: a boundary is observable only via atBoundary
      if (pi < parts.length) parts(pi).length - po else 0
    }
    def readByte(): Int = { ensure(); val v = parts(pi)(po) & 0xff; po += 1; v }
    def readU16(): Int = readByte() | (readByte() << 8)
    def readI32(): Int = readU16() | (readU16() << 16)
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) { ensure(); val t = math.min(left, remainingInPart.toLong).toInt
        po += t; left -= t }
    }
    def atBoundary: Boolean = pi < parts.length && po >= parts(pi).length
    /** One XLUnicodeRichExtendedString's text (runs/ext skipped). */
    def readRichString(): String = {
      val cch = readU16()
      var grbit = readByte()
      val fRich = (grbit & 0x08) != 0
      val fExt = (grbit & 0x04) != 0
      val cRun = if (fRich) readU16() else 0
      val cbExt = if (fExt) readI32() else 0
      var high = (grbit & 1) != 0
      val sb = new java.lang.StringBuilder(cch)
      var left = cch
      while (left > 0) {
        if (atBoundary) { // fresh grbit at every CONTINUE split in char data
          grbit = readByte()
          high = (grbit & 1) != 0
        }
        if (high) { val lo = readByte(); val hi = readByte()
          sb.append(((hi << 8) | lo).toChar) }
        else sb.append((readByte() & 0xff).toChar) // compressed = Latin-1
        left -= 1
      }
      skip(4L * cRun); skip(cbExt.toLong & 0xffffffffL)
      sb.toString
    }
  }

  /** Short XLUnicodeString embedded in a single record (LABEL, FORMAT,
    * STRING, BOUNDSHEET name): cch (8 or 16 bit), grbit, chars. */
  private def recordString(p: Array[Byte], off: Int, cch16: Boolean): String = {
    val cch = if (cch16) u16(p, off) else u8(p, off)
    val hOff = off + (if (cch16) 2 else 1)
    val grbit = u8(p, hOff)
    val high = (grbit & 1) != 0
    val cOff = hOff + 1 +
      (if ((grbit & 0x08) != 0) 2 else 0) + (if ((grbit & 0x04) != 0) 4 else 0)
    val sb = new java.lang.StringBuilder(cch)
    var i = 0
    while (i < cch) {
      if (high) sb.append(((u8(p, cOff + 2 * i + 1) << 8) | u8(p, cOff + 2 * i)).toChar)
      else sb.append((u8(p, cOff + i)).toChar)
      i += 1
    }
    sb.toString
  }

  /** RK-encoded number: bit0 = ÷100, bit1 = 30-bit signed int vs the top
    * 34 bits of an IEEE double. */
  private[graft] def rkValue(rk: Long): Double = {
    val div100 = (rk & 1L) != 0
    val isInt = (rk & 2L) != 0
    val v =
      if (isInt) {
        var x = (rk >> 2) & 0x3fffffffL
        if ((x & 0x20000000L) != 0) x -= 0x40000000L
        x.toDouble
      } else java.lang.Double.longBitsToDouble((rk >>> 2) << 34)
    if (div100) v / 100.0 else v
  }

  /** Canonical number rendering, matching the .xlsx reader's raw cell
    * strings: integral values render bare ("30", not "30.0"). */
  private def numString(v: Double): String =
    if (v == math.rint(v) && !v.isInfinite && math.abs(v) < 1e15)
      v.toLong.toString
    else v.toString

  /** Parse the `sheet`-th worksheet (0-based, BOUNDSHEET order) of one
    * `.xls` file's bytes — same Sheet contract as [[Excel.parseSheet]]. */
  def parseSheet(bytes: Array[Byte], sheet: Int = 0): Excel.Sheet = {
    val wb = oleStream(bytes, Seq("Workbook", "Book"))

    // ---- pass 1: workbook globals (ends at first EOF) ----
    var off = 0
    require(wb.length >= 4 && u16(wb, 0) == RT_BOF, "stream does not start with BOF")
    val sheetOffsets = mutable.ArrayBuffer[Int]()
    var sstParts: IndexedSeq[Array[Byte]] = IndexedSeq.empty
    var inSstContinue = false
    val xfFmtIds = mutable.ArrayBuffer[Int]()
    val customFmts = mutable.Map[Int, String]()
    var date1904 = false
    var done = false
    while (!done && off + 4 <= wb.length) {
      val t = u16(wb, off); val l = u16(wb, off + 2)
      val p = java.util.Arrays.copyOfRange(wb, off + 4, off + 4 + l)
      t match {
        case RT_EOF => done = true
        case RT_FILEPASS =>
          throw new IllegalArgumentException(
            "encrypted .xls workbook (FILEPASS) — decrypt/convert it first")
        case RT_BOUNDSHEET =>
          sheetOffsets += i32(p, 0)
          inSstContinue = false
        case RT_SST =>
          sstParts = IndexedSeq(p); inSstContinue = true
        case RT_CONTINUE if inSstContinue =>
          sstParts = sstParts :+ p
        case RT_XF =>
          xfFmtIds += u16(p, 2)
          inSstContinue = false
        case RT_FORMAT =>
          customFmts(u16(p, 0)) = recordString(p, 2, cch16 = true)
          inSstContinue = false
        case RT_DATE1904 =>
          date1904 = u16(p, 0) != 0
          inSstContinue = false
        case _ =>
          inSstContinue = false
      }
      off += 4 + l
    }
    require(sheetOffsets.nonEmpty, "workbook has no BOUNDSHEET records")
    require(sheet >= 0 && sheet < sheetOffsets.length,
      s"sheet $sheet out of range: workbook has ${sheetOffsets.length} sheet(s)")

    val sst: IndexedSeq[String] =
      if (sstParts.isEmpty) IndexedSeq.empty
      else {
        val r = new PartsReader(sstParts)
        r.skip(4) // cstTotal
        val unique = { val lo = r.readU16(); val hi = r.readU16(); lo | (hi << 16) }
        (0 until unique).map(_ => r.readRichString())
      }

    val dateXfs: Map[Int, Char] = xfFmtIds.zipWithIndex.flatMap {
      case (fmtId, xfIdx) =>
        Excel.fmtFlavor(fmtId, customFmts.toMap).map(xfIdx -> _)
    }.toMap

    // ---- pass 2: the chosen worksheet substream ----
    off = sheetOffsets(sheet)
    require(off + 4 <= wb.length && u16(wb, off) == RT_BOF,
      s"BOUNDSHEET offset $off does not point at a BOF")
    off += 4 + u16(wb, off + 2)
    val cells = mutable.Map[(Int, Int), String]()
    var maxRow = -1
    var maxCol = -1
    def put(row: Int, colI: Int, v: String): Unit = if (v != null) {
      cells((row, colI)) = v
      if (row > maxRow) maxRow = row
      if (colI > maxCol) maxCol = colI
    }
    def numCell(row: Int, colI: Int, ixfe: Int, v: Double): Unit =
      put(row, colI, dateXfs.get(ixfe)
        .map(f => Excel.serialToIso(v, f, date1904))
        .getOrElse(numString(v)))
    var pendingString: Option[(Int, Int)] = None // FORMULA awaiting STRING
    done = false
    while (!done && off + 4 <= wb.length) {
      val t = u16(wb, off); val l = u16(wb, off + 2)
      val p = java.util.Arrays.copyOfRange(wb, off + 4, off + 4 + l)
      t match {
        case RT_EOF => done = true
        case RT_LABELSST =>
          val i = i32(p, 6)
          put(u16(p, 0), u16(p, 2),
            if (i >= 0 && i < sst.length) sst(i) else null)
        case RT_NUMBER =>
          numCell(u16(p, 0), u16(p, 2), u16(p, 4),
            java.lang.Double.longBitsToDouble(
              u32(p, 6) | (u32(p, 10) << 32)))
        case RT_RK =>
          numCell(u16(p, 0), u16(p, 2), u16(p, 4), rkValue(u32(p, 6)))
        case RT_MULRK =>
          val row = u16(p, 0); val colFirst = u16(p, 2)
          val colLast = u16(p, l - 2)
          var i = 0
          while (i <= colLast - colFirst) {
            numCell(row, colFirst + i, u16(p, 4 + 6 * i), rkValue(u32(p, 6 + 6 * i)))
            i += 1
          }
        case RT_LABEL =>
          put(u16(p, 0), u16(p, 2), recordString(p, 6, cch16 = true))
        case RT_BOOLERR =>
          if (u8(p, 7) == 0) // bool; error cells stay null
            put(u16(p, 0), u16(p, 2), if (u8(p, 6) != 0) "true" else "false")
        case RT_FORMULA =>
          val row = u16(p, 0); val colI = u16(p, 2); val ixfe = u16(p, 4)
          if (u16(p, 12) == 0xffff) u8(p, 6) match {
            case 0 => pendingString = Some((row, colI)) // STRING record follows
            case 1 => put(row, colI, if (u8(p, 8) != 0) "true" else "false")
            case _ => // error / empty cached value
          } else numCell(row, colI, ixfe,
            java.lang.Double.longBitsToDouble(u32(p, 6) | (u32(p, 10) << 32)))
        case RT_STRING =>
          pendingString.foreach { case (row, colI) =>
            put(row, colI, recordString(p, 0, cch16 = true))
          }
          pendingString = None
        case _ =>
      }
      off += 4 + l
    }

    if (cells.isEmpty) return Excel.Sheet(Seq.empty, Seq.empty)
    val width = maxCol + 1
    def dense(row: Int): Array[String] = {
      val a = new Array[String](width)
      var c = 0
      while (c < width) { a(c) = cells.getOrElse((row, c), null); c += 1 }
      a
    }
    // .xlsx-reader parity: header = FIRST row with any cell; rows with no
    // cells at all do not appear in the output
    val presentRows = cells.keysIterator.map(_._1).toSeq.distinct.sorted
    val headerCells = dense(presentRows.head)
    val header = headerCells.zipWithIndex.map { case (h, i) =>
      if (h == null || h.isEmpty) s"_c$i" else h
    }.toSeq
    Excel.Sheet(header, presentRows.tail.map(dense))
  }
}
