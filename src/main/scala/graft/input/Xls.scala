package graft.input

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** Legacy binary spreadsheet source: BIFF8 `.xls` — the reference's
  * pandas `read_excel` also accepts the pre-OOXML format
  * (`dataframe.py:161-190`, pandas dispatches on magic to xlrd). No
  * format library ships in this image, so both layers are written from
  * the PUBLIC specs: the container from MS-CFB (Compound File Binary,
  * v3/v4 sector layout, FAT/miniFAT/DIFAT chains) and the workbook
  * stream from MS-XLS (BIFF8 records).
  *
  * Reader coverage: CFB v3 (512 B sectors) and v4 (4096 B), workbook
  * streams in the regular FAT chain or (size < 4096) the root entry's
  * mini stream via the miniFAT; BIFF8 records BOF/EOF, BOUNDSHEET (first
  * sheet), SST with CONTINUE spill (fragments that restart mid-string
  * re-read the compressed/UTF-16 flags byte, per MS-XLS 2.5.268),
  * FORMAT + XF (date-format detection shared with the OOXML reader),
  * LABELSST, LABEL, NUMBER, RK (all four encodings: int / x100 /
  * truncated-double), MULRK, BOOLERR, FORMULA cached results (numeric,
  * boolean, string via the trailing STRING record, error -> null), and
  * BLANK/MULBLANK (null cells). Error cells and unknown records degrade
  * to null / skipped, never a whole-ingest failure — same policy as
  * [[Xlsx]]. Date-styled serials surface as ISO-8601 strings through the
  * same 1900-leap-bug epoch logic ([[Xlsx.serialToIso]]).
  *
  * Shape note: like the OOXML path, `.xls` files are small single files
  * by construction (the reference routes them through driver-side pandas
  * too) — the parse runs on the driver and rows enter Spark via
  * `createDataFrame`; the distributed pipeline starts at the first
  * transformation.
  */
object Xls {

  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    Xlsx.toDataFrame(spark, readCells(bytes))
  }

  // ------------------------------------------------------------------
  // CFB container (MS-CFB)
  // ------------------------------------------------------------------

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Extract the Workbook/Book stream bytes from a CFB file. */
  private[graft] def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 512 &&
      (bytes(0) & 0xff) == 0xD0 && (bytes(1) & 0xff) == 0xCF &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xE0,
      "not a CFB (.xls) file: bad signature")
    val sectorSize = 1 << u16(bytes, 30)
    val miniSize = 1 << u16(bytes, 32)
    val numFat = i32(bytes, 44)
    val firstDir = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val firstDifat = i32(bytes, 68)
    val numDifat = i32(bytes, 72)

    // sector id -> file offset: sector 0 begins right after the header
    // REGION (one full sector for v4; 512 B for v3 — (id+1)*size covers both)
    def sector(id: Int): Array[Byte] = {
      val off = (id.toLong + 1L) * sectorSize
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + sectorSize)
    }

    // FAT sector ids: 109 DIFAT slots in the header, then the DIFAT chain
    val fatSectorIds = mutable.ArrayBuffer.empty[Int]
    var di = 0
    while (di < 109 && fatSectorIds.length < numFat) {
      val v = i32(bytes, 76 + di * 4)
      if (v != FreeSect && v != EndOfChain) fatSectorIds += v
      di += 1
    }
    var difatId = firstDifat
    var difatSeen = 0
    while (difatId != EndOfChain && difatId != FreeSect && difatSeen < numDifat) {
      val s = sector(difatId)
      val perSector = sectorSize / 4 - 1
      var j = 0
      while (j < perSector && fatSectorIds.length < numFat) {
        val v = i32(s, j * 4)
        if (v != FreeSect && v != EndOfChain) fatSectorIds += v
        j += 1
      }
      difatId = i32(s, perSector * 4)
      difatSeen += 1
    }
    val fat: Array[Int] = fatSectorIds.toArray.flatMap { id =>
      val s = sector(id)
      (0 until sectorSize / 4).map(j => i32(s, j * 4))
    }

    def readChain(start: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      var id = start
      var guard = 0
      while (id != EndOfChain && id != FreeSect && guard <= fat.length) {
        out.write(sector(id))
        id = fat(id)
        guard += 1
      }
      out.toByteArray
    }

    val dir = readChain(firstDir)
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { k =>
      val o = k * 128
      val nameLen = u16(dir, o + 64) // bytes incl. UTF-16 terminator
      val name = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      val size = (i32(dir, o + 120).toLong & 0xFFFFFFFFL) |
        ((i32(dir, o + 124).toLong & 0xFFFFFFFFL) << 32)
      Entry(name, dir(o + 66) & 0xff, i32(dir, o + 116), size)
    }
    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("CFB: no root entry"))
    val wb = entries.find(e => e.objType == 2 &&
        (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(throw new IllegalArgumentException(
        "CFB: no Workbook/Book stream"))

    if (wb.size >= miniCutoff) {
      readChain(wb.start).take(wb.size.toInt)
    } else {
      // small stream: 64 B mini sectors inside the root entry's chain
      val miniStream = readChain(root.start)
      val miniFatBytes = readChain(firstMiniFat)
      def miniNext(id: Int): Int = i32(miniFatBytes, id * 4)
      val out = new ByteArrayOutputStream()
      var id = wb.start
      var guard = 0
      while (id != EndOfChain && id != FreeSect &&
             guard <= miniFatBytes.length / 4) {
        out.write(miniStream, id * miniSize,
          math.min(miniSize, miniStream.length - id * miniSize))
        id = miniNext(id)
        guard += 1
      }
      out.toByteArray.take(wb.size.toInt)
    }
  }

  // ------------------------------------------------------------------
  // BIFF8 workbook stream (MS-XLS)
  // ------------------------------------------------------------------

  private object Rec {
    val BOF = 0x0809; val EOF = 0x000A; val CONTINUE = 0x003C
    val BOUNDSHEET = 0x0085; val SST = 0x00FC; val FORMAT = 0x041E
    val XF = 0x00E0; val LABELSST = 0x00FD; val LABEL = 0x0204
    val NUMBER = 0x0203; val RK = 0x027E; val MULRK = 0x00BD
    val BOOLERR = 0x0205; val FORMULA = 0x0006; val STRING = 0x0207
    val BLANK = 0x0201; val MULBLANK = 0x00BE
  }

  /** RK number: 30-bit payload, bit0 = divide by 100, bit1 = integer
    * (else the payload is the TOP 30 bits of an IEEE double).
    */
  private[graft] def decodeRk(rk: Int): Double = {
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble // arithmetic shift: signed
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  /** Cursor over a record's data plus its CONTINUE fragments. String
    * CHARACTER runs that spill into the next fragment re-read the flags
    * byte at the fragment start (MS-XLS: a fragment beginning mid-string
    * begins with its own fHighByte flags); all other reads cross
    * fragment boundaries transparently.
    */
  private final class Frags(frags: IndexedSeq[Array[Byte]]) {
    private var fi = 0
    private var off = 0
    private def roll(): Unit =
      while (fi < frags.length && off >= frags(fi).length) { fi += 1; off = 0 }
    def hasRemaining: Boolean = { roll(); fi < frags.length }
    def u8(): Int = { roll(); val v = frags(fi)(off) & 0xff; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u16() | (u16() << 16)
    def skip(n: Int): Unit = (0 until n).foreach(_ => u8())
    def readString(cch: Int, rich: Boolean, ext: Boolean): String = {
      var flags = u8()
      val cRun = if (rich) u16() else 0
      val cbExt = if (ext) i32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var left = cch
      while (left > 0) {
        roll()
        // off == 0 here means a fragment rolled during the character run
        // (the header read leaves off > 0 in its own fragment) — including
        // a boundary between the 3-byte header and the FIRST character,
        // which the writer's needFrag(3+1) can emit for uncompressed
        // strings. Per MS-XLS 2.5.268 every such continuation restarts
        // with its own fHighByte flags byte.
        val atBoundary = off == 0
        if (atBoundary) flags = u8() // mid-string spill: fresh flags byte
        if ((flags & 1) == 0) sb.append((u8()).toChar)
        else sb.append((u16()).toChar)
        left -= 1
      }
      skip(cRun * 4 + cbExt)
      sb.toString
    }
    /** XLUnicodeRichExtendedString: cch(2) flags(1) [cRun] [cbExt] chars runs ext */
    def readRichString(): String = {
      val cch = u16()
      // peek flags to learn rich/ext, then delegate (readString re-reads)
      roll()
      val flags = frags(fi)(off) & 0xff
      readString(cch, rich = (flags & 8) != 0, ext = (flags & 4) != 0)
    }
  }

  /** First sheet's raw cell grid, same shape as [[Xlsx.readXlsxCells]]. */
  private[graft] def readCells(fileBytes: Array[Byte]): Seq[Seq[Option[Any]]] = {
    val s = workbookStream(fileBytes)
    // split the stream into (id, data) records
    case class R(id: Int, data: Array[Byte])
    val records = mutable.ArrayBuffer.empty[R]
    var p = 0
    while (p + 4 <= s.length) {
      val id = u16(s, p); val len = u16(s, p + 2)
      if (p + 4 + len > s.length) { p = s.length }
      else {
        records += R(id, java.util.Arrays.copyOfRange(s, p + 4, p + 4 + len))
        p += 4 + len
      }
    }

    // ---- workbook globals substream ----
    val sst = mutable.ArrayBuffer.empty[String]
    val xfIfmt = mutable.ArrayBuffer.empty[Int]
    val customDateFmt = mutable.Set.empty[Int]
    var firstSheetPos = -1
    var i = 0
    var inGlobals = false
    var done = false
    while (i < records.length && !done) {
      val r = records(i)
      r.id match {
        case Rec.BOF =>
          if (!inGlobals) inGlobals = true
        case Rec.EOF => done = true // end of globals substream
        case Rec.BOUNDSHEET =>
          if (firstSheetPos < 0) firstSheetPos = i32(r.data, 0)
        case Rec.FORMAT =>
          val ifmt = u16(r.data, 0)
          val f = new Frags(IndexedSeq(java.util.Arrays.copyOfRange(
            r.data, 2, r.data.length)))
          if (Xlsx.isDateFormatCode(f.readRichString())) customDateFmt += ifmt
        case Rec.XF =>
          xfIfmt += u16(r.data, 2)
        case Rec.SST =>
          // gather this SST's CONTINUE fragments
          val frags = mutable.ArrayBuffer(r.data)
          var j = i + 1
          while (j < records.length && records(j).id == Rec.CONTINUE) {
            frags += records(j).data; j += 1
          }
          val f = new Frags(frags.toIndexedSeq)
          f.i32() // cstTotal
          val unique = f.i32()
          (0 until unique).foreach(_ => sst += f.readRichString())
        case _ =>
      }
      i += 1
    }

    def isDateXf(ixfe: Int): Boolean =
      ixfe >= 0 && ixfe < xfIfmt.length && {
        val ifmt = xfIfmt(ixfe)
        Xlsx.BuiltinDateFmts.contains(ifmt) || customDateFmt.contains(ifmt)
      }
    def num(v: Double, ixfe: Int): Any =
      if (isDateXf(ixfe)) Xlsx.serialToIso(v) else v

    // ---- first worksheet substream (located by BOUNDSHEET position) ----
    val rows = mutable.TreeMap.empty[Int, mutable.TreeMap[Int, Option[Any]]]
    def put(rw: Int, col: Int, v: Option[Any]): Unit =
      rows.getOrElseUpdate(rw, mutable.TreeMap.empty) += (col -> v)

    var q = 0
    // find the record index whose stream offset equals firstSheetPos
    var offAcc = 0
    var sheetStart = -1
    q = 0
    while (q < records.length && sheetStart < 0) {
      if (offAcc == firstSheetPos) sheetStart = q
      offAcc += 4 + records(q).data.length
      q += 1
    }
    require(sheetStart >= 0, "BIFF8: first sheet substream not found")

    q = sheetStart
    var sheetDone = false
    while (q < records.length && !sheetDone) {
      val r = records(q)
      val d = r.data
      r.id match {
        case Rec.EOF => sheetDone = true
        case Rec.LABELSST =>
          val idx = i32(d, 6)
          put(u16(d, 0), u16(d, 2),
            if (idx >= 0 && idx < sst.length) Some(sst(idx)) else None)
        case Rec.LABEL =>
          val f = new Frags(IndexedSeq(java.util.Arrays.copyOfRange(
            d, 6, d.length)))
          put(u16(d, 0), u16(d, 2), Some(f.readRichString()))
        case Rec.NUMBER =>
          val bits = (i32(d, 6).toLong & 0xFFFFFFFFL) |
            ((i32(d, 10).toLong & 0xFFFFFFFFL) << 32)
          put(u16(d, 0), u16(d, 2),
            Some(num(java.lang.Double.longBitsToDouble(bits), u16(d, 4))))
        case Rec.RK =>
          put(u16(d, 0), u16(d, 2),
            Some(num(decodeRk(i32(d, 6)), u16(d, 4))))
        case Rec.MULRK =>
          val rw = u16(d, 0); val colFirst = u16(d, 2)
          val n = (d.length - 6) / 6
          (0 until n).foreach { k =>
            put(rw, colFirst + k,
              Some(num(decodeRk(i32(d, 4 + k * 6 + 2)), u16(d, 4 + k * 6))))
          }
        case Rec.BOOLERR =>
          val isErr = (d(7) & 0xff) != 0
          put(u16(d, 0), u16(d, 2),
            if (isErr) None else Some((d(6) & 0xff) != 0))
        case Rec.FORMULA =>
          val rw = u16(d, 0); val col = u16(d, 2); val ixfe = u16(d, 4)
          if (u16(d, 12) == 0xFFFF) {
            (d(6) & 0xff) match {
              case 0 => // string result: in the trailing STRING record
                val sr = records.indexWhere(_.id == Rec.STRING, q + 1)
                if (sr >= 0 && sr <= q + 2) {
                  val f = new Frags(IndexedSeq(records(sr).data))
                  put(rw, col, Some(f.readRichString()))
                } else put(rw, col, None)
              case 1 => put(rw, col, Some((d(8) & 0xff) != 0))
              case 3 => put(rw, col, Some(""))
              case _ => put(rw, col, None) // error result
            }
          } else {
            val bits = (i32(d, 6).toLong & 0xFFFFFFFFL) |
              ((i32(d, 10).toLong & 0xFFFFFFFFL) << 32)
            put(rw, col, Some(num(java.lang.Double.longBitsToDouble(bits), ixfe)))
          }
        case Rec.BLANK | Rec.MULBLANK => // explicit nulls: grid pads anyway
        case _ =>
      }
      q += 1
    }

    rows.values.map { cols =>
      if (cols.isEmpty) Seq.empty[Option[Any]]
      else {
        val width = cols.lastKey + 1
        (0 until width).map(c => cols.getOrElse(c, None)).toSeq
      }
    }.toSeq
  }

  // ------------------------------------------------------------------
  // writer (test fixtures + legacy-sink completeness)
  // ------------------------------------------------------------------

  private final class RecBuf {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): this.type = { out.write(v & 0xff); this }
    def u16(v: Int): this.type = { u8(v); u8(v >> 8); this }
    def i32(v: Int): this.type = { u16(v); u16(v >> 16); this }
    def i64(v: Long): this.type = { i32(v.toInt); i32((v >> 32).toInt); this }
    def bytes(b: Array[Byte]): this.type = { out.write(b); this }
    def result: Array[Byte] = out.toByteArray
  }

  private def record(id: Int, data: Array[Byte]): Array[Byte] =
    new RecBuf().u16(id).u16(data.length).bytes(data).result

  /** Days+fraction since the Excel 1900 epoch (post-Feb-1900 dates only,
    * which is all this writer emits — the leap-bug region is a reader
    * concern, spec-pinned in [[Xlsx.serialToIso]]).
    */
  private def toSerial(ts: java.time.LocalDateTime): Double = {
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1899, 12, 30), ts.toLocalDate)
    days + ts.toLocalTime.toSecondOfDay / 86400.0
  }

  /** Write a DataFrame (collected — spreadsheets are small by contract)
    * as a real BIFF8 .xls inside a real CFB container. Cell encodings
    * exercise the reader's full record set: 30-bit integers as RK (runs
    * of 2+ in a row fold into MULRK), other numerics as NUMBER, strings
    * via the SST + LABELSST (spilling into CONTINUE fragments mid-string
    * when the SST record fills), booleans as BOOLERR, timestamps as date
    * serials under a custom date FORMAT + XF, nulls as BLANK. Streams
    * under 4096 bytes land in the CFB mini stream (miniFAT path), larger
    * ones in the regular FAT chain — both reader paths get real files.
    */
  def write(df: DataFrame, path: String): Unit = {
    val names = df.schema.fieldNames
    val rows = df.collect()

    // --- SST: collect unique strings in first-use order ---
    val sstIndex = mutable.LinkedHashMap.empty[String, Int]
    def sstId(sv: String): Int =
      sstIndex.getOrElseUpdate(sv, sstIndex.size)
    var totalRefs = 0
    names.foreach { n => sstId(n); totalRefs += 1 }
    rows.foreach { r =>
      names.indices.foreach { ci =>
        r.get(ci) match {
          case sv: String => sstId(sv); totalRefs += 1
          case _ =>
        }
      }
    }

    // --- cell records for one row ---
    val GeneralXf = 16 // after the 16 style XFs below
    val DateXf = 17
    def rowRecords(rw: Int, vals: IndexedSeq[Any]): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      var ci = 0
      while (ci < vals.length) {
        vals(ci) match {
          case null => buf.write(record(Rec.BLANK,
            new RecBuf().u16(rw).u16(ci).u16(GeneralXf).result))
          case b: Boolean => buf.write(record(Rec.BOOLERR,
            new RecBuf().u16(rw).u16(ci).u16(GeneralXf)
              .u8(if (b) 1 else 0).u8(0).result))
          case sv: String => buf.write(record(Rec.LABELSST,
            new RecBuf().u16(rw).u16(ci).u16(GeneralXf).i32(sstId(sv)).result))
          case t: java.sql.Timestamp => buf.write(record(Rec.NUMBER,
            new RecBuf().u16(rw).u16(ci).u16(DateXf)
              .i64(java.lang.Double.doubleToLongBits(
                toSerial(t.toLocalDateTime))).result))
          case d: java.sql.Date => buf.write(record(Rec.NUMBER,
            new RecBuf().u16(rw).u16(ci).u16(DateXf)
              .i64(java.lang.Double.doubleToLongBits(
                toSerial(d.toLocalDate.atStartOfDay()))).result))
          case n: Number =>
            val dv = n.doubleValue()
            val isRkInt = dv == math.rint(dv) &&
              dv >= -536870912.0 && dv <= 536870911.0 &&
              (n.isInstanceOf[java.lang.Long] || n.isInstanceOf[Integer] ||
                n.isInstanceOf[java.lang.Short] || n.isInstanceOf[java.lang.Byte])
            if (isRkInt) {
              // gather the run of consecutive RK-int cells -> MULRK
              var cj = ci
              val rks = mutable.ArrayBuffer.empty[Int]
              var run = true
              while (run && cj < vals.length) {
                vals(cj) match {
                  case m: Number
                    if m.doubleValue() == math.rint(m.doubleValue()) &&
                      m.doubleValue() >= -536870912.0 &&
                      m.doubleValue() <= 536870911.0 &&
                      (m.isInstanceOf[java.lang.Long] || m.isInstanceOf[Integer] ||
                        m.isInstanceOf[java.lang.Short] || m.isInstanceOf[java.lang.Byte]) =>
                    rks += ((m.longValue().toInt << 2) | 2)
                    cj += 1
                  case _ => run = false
                }
              }
              if (rks.length >= 2) {
                val rb = new RecBuf().u16(rw).u16(ci)
                rks.foreach(rk => rb.u16(GeneralXf).i32(rk))
                rb.u16(ci + rks.length - 1)
                buf.write(record(Rec.MULRK, rb.result))
                ci = cj - 1
              } else {
                buf.write(record(Rec.RK,
                  new RecBuf().u16(rw).u16(ci).u16(GeneralXf).i32(rks(0)).result))
              }
            } else {
              buf.write(record(Rec.NUMBER,
                new RecBuf().u16(rw).u16(ci).u16(GeneralXf)
                  .i64(java.lang.Double.doubleToLongBits(dv)).result))
            }
          case other => buf.write(record(Rec.LABELSST,
            new RecBuf().u16(rw).u16(ci).u16(GeneralXf)
              .i32(sstId(other.toString)).result))
        }
        ci += 1
      }
      buf.toByteArray
    }

    // --- sheet substream ---
    val sheet = new ByteArrayOutputStream()
    sheet.write(record(Rec.BOF,
      new RecBuf().u16(0x0600).u16(0x0010).u16(0).u16(0).i32(0).i32(0).result))
    sheet.write(rowRecords(0, names.toIndexedSeq))
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheet.write(rowRecords(ri + 1,
        names.indices.map(r.get).toIndexedSeq))
    }
    sheet.write(record(Rec.EOF, Array.emptyByteArray))
    val sheetBytes = sheet.toByteArray

    // --- globals substream ---
    val MaxData = 8224 // BIFF8 record-data cap; SST spills into CONTINUE
    def sstRecords: Array[Byte] = {
      // fragments of (possibly mid-string-split) SST payload
      val frags = mutable.ArrayBuffer(new ByteArrayOutputStream())
      def room: Int = MaxData - frags.last.size()
      def needFrag(min: Int): Unit =
        if (room < min) frags += new ByteArrayOutputStream()
      val head = new RecBuf().i32(totalRefs).i32(sstIndex.size).result
      frags.last.write(head)
      sstIndex.keys.foreach { sv =>
        val compressed = sv.forall(_ < 256)
        // string header (cch + flags) never splits
        needFrag(3 + 1)
        frags.last.write(new RecBuf().u16(sv.length)
          .u8(if (compressed) 0 else 1).result)
        var k = 0
        while (k < sv.length) {
          val w = if (compressed) 1 else 2
          if (room < w) {
            // mid-string spill: next fragment restarts with a flags byte
            frags += new ByteArrayOutputStream()
            frags.last.write(if (compressed) 0 else 1)
          }
          if (compressed) frags.last.write(sv.charAt(k) & 0xff)
          else frags.last.write(new RecBuf().u16(sv.charAt(k)).result)
          k += 1
        }
      }
      val out = new ByteArrayOutputStream()
      frags.zipWithIndex.foreach { case (f, idx) =>
        out.write(record(if (idx == 0) Rec.SST else Rec.CONTINUE, f.toByteArray))
      }
      out.toByteArray
    }

    def xfRecord(ifmt: Int): Array[Byte] =
      record(Rec.XF, new RecBuf().u16(0).u16(ifmt).u16(0xFFF5)
        .bytes(new Array[Byte](14)).result)

    val dateFmtCode = "yyyy-mm-dd hh:mm:ss"
    val formatRec = record(Rec.FORMAT, {
      val rb = new RecBuf().u16(164).u16(dateFmtCode.length).u8(0)
      dateFmtCode.foreach(c => rb.u8(c))
      rb.result
    })

    // BOUNDSHEET needs the sheet substream's stream offset — assemble the
    // globals with a placeholder, then patch.
    def globals(sheetPos: Int): Array[Byte] = {
      val g = new ByteArrayOutputStream()
      g.write(record(Rec.BOF,
        new RecBuf().u16(0x0600).u16(0x0005).u16(0).u16(0).i32(0).i32(0).result))
      g.write(formatRec)
      (0 until 16).foreach(_ => g.write(xfRecord(0))) // style XFs
      g.write(xfRecord(0)) // 16: general cell XF
      g.write(xfRecord(164)) // 17: date cell XF
      val name = "Sheet1"
      val bs = new RecBuf().i32(sheetPos).u16(0).u8(name.length).u8(0)
      name.foreach(c => bs.u8(c))
      g.write(record(Rec.BOUNDSHEET, bs.result))
      g.write(sstRecords)
      g.write(record(Rec.EOF, Array.emptyByteArray))
      g.toByteArray
    }
    val globalsLen = globals(0).length // position-independent length
    val stream = new ByteArrayOutputStream()
    stream.write(globals(globalsLen))
    stream.write(sheetBytes)

    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      cfbContainer(stream.toByteArray))
  }

  /** Wrap a single Workbook stream in a minimal-but-conformant CFB v3
    * container: 512 B sectors, header-DIFAT only (enough for ~6.8 MB of
    * FAT coverage), streams under the 4096 B cutoff stored in the root
    * mini stream via a real miniFAT.
    */
  private[input] def cfbContainer(stream: Array[Byte]): Array[Byte] = {
    val S = 512
    def sectorsFor(n: Int, unit: Int): Int = (n + unit - 1) / unit
    val mini = stream.length < 4096

    // payload region: either the stream itself or the mini stream holding it
    val payload =
      if (!mini) stream
      else {
        val nMini = sectorsFor(stream.length, 64)
        val ms = new Array[Byte](nMini * 64)
        System.arraycopy(stream, 0, ms, 0, stream.length)
        ms
      }
    val nPayload = sectorsFor(payload.length, S)
    val nMiniFat = if (mini) 1 else 0 // 128 entries: plenty under 4096 B
    val nDir = 1 // 4 entries of 128 B

    // iterate FAT sizing: each FAT sector maps 128 sectors incl. itself
    var nFat = 1
    var total = nFat + nDir + nMiniFat + nPayload
    while (nFat * 128 < total) { nFat += 1; total = nFat + nDir + nMiniFat + nPayload }

    // sector layout: [FAT][dir][miniFAT][payload]
    val dirSector = nFat
    val miniFatSector = nFat + nDir
    val payloadStart = nFat + nDir + nMiniFat

    val fat = Array.fill(nFat * 128)(FreeSect)
    (0 until nFat).foreach(k => fat(k) = 0xFFFFFFFD) // FATSECT
    fat(dirSector) = EndOfChain
    if (mini) fat(miniFatSector) = EndOfChain
    (0 until nPayload).foreach { k =>
      fat(payloadStart + k) =
        if (k == nPayload - 1) EndOfChain else payloadStart + k + 1
    }

    val miniFat = Array.fill(128)(FreeSect)
    if (mini) {
      val nMini = sectorsFor(stream.length, 64)
      (0 until nMini).foreach { k =>
        miniFat(k) = if (k == nMini - 1) EndOfChain else k + 1
      }
    }

    def dirEntry(name: String, objType: Int, child: Int, start: Int,
        size: Long): Array[Byte] = {
      val e = new Array[Byte](128)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      System.arraycopy(nb, 0, e, 0, nb.length)
      val rb = new RecBuf().u16(nb.length + 2).result
      e(64) = rb(0); e(65) = rb(1)
      e(66) = objType.toByte
      e(67) = 1 // black
      // left/right sibling, child
      def put32(off: Int, v: Int): Unit = {
        val b = new RecBuf().i32(v).result
        System.arraycopy(b, 0, e, off, 4)
      }
      put32(68, -1); put32(72, -1); put32(76, child)
      put32(116, start)
      put32(120, (size & 0xFFFFFFFFL).toInt)
      put32(124, ((size >> 32) & 0xFFFFFFFFL).toInt)
      e
    }
    val dir = new ByteArrayOutputStream()
    dir.write(dirEntry("Root Entry", 5, 1,
      if (mini) payloadStart else EndOfChain,
      if (mini) payload.length.toLong else 0L))
    dir.write(dirEntry("Workbook", 2, -1,
      if (mini) 0 else payloadStart, stream.length.toLong))
    dir.write(new Array[Byte](128 * 2)) // two free entries pad the sector

    val header = new RecBuf()
    header.bytes(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    header.bytes(new Array[Byte](16)) // CLSID
    header.u16(0x003E).u16(0x0003) // minor/major
    header.u16(0xFFFE) // little-endian
    header.u16(9).u16(6) // sector/mini shifts
    header.bytes(new Array[Byte](6))
    header.i32(0) // num dir sectors (v3: 0)
    header.i32(nFat)
    header.i32(dirSector)
    header.i32(0) // transaction
    header.i32(4096) // mini cutoff
    header.i32(if (mini) miniFatSector else EndOfChain)
    header.i32(nMiniFat)
    header.i32(EndOfChain) // first DIFAT
    header.i32(0) // num DIFAT
    (0 until 109).foreach(k => header.i32(if (k < nFat) k else FreeSect))

    val out = new ByteArrayOutputStream()
    out.write(header.result)
    fat.foreach(v => out.write(new RecBuf().i32(v).result))
    out.write(dir.toByteArray)
    if (mini) miniFat.foreach(v => out.write(new RecBuf().i32(v).result))
    out.write(payload)
    // pad the final sector
    val rem = out.size() % S
    if (rem != 0) out.write(new Array[Byte](S - rem))
    out.toByteArray
  }
}
