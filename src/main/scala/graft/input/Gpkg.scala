package graft.input

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** GeoPackage vector source (reference S5): the reference dispatches
  * `.gpkg` through `pyspark_vector_files.gpkg.read_gpkg`
  * (`dataframe.py:194-195`), which reads the SQLite container and
  * converts GPKG geometry BLOBs to WKB columns. No SQLite library ships
  * in this image, so the container is parsed from scratch against the
  * PUBLIC file-format spec (sqlite.org/fileformat2): page-based table
  * b-trees (leaf 0x0D / interior 0x05), varint record headers with
  * serial-type values, payload overflow chains, and the `sqlite_master`
  * catalog; the GPKG layer (OGC 12-128r17) supplies
  * `gpkg_geometry_columns` for layer discovery and the GeoPackage
  * binary geometry header (magic GP, flags, srs_id, envelope) that
  * wraps standard WKB.
  *
  * Output contract matches the engine-wide S5 shape: attribute columns
  * typed from the declared SQLite schema (INTEGER -> long, REAL ->
  * double, TEXT -> string), the geometry column as raw WKB
  * `BinaryType` (GPKG header stripped) ready for [[graft.geo.Wkb]] /
  * the spatial-join operators. Like the other driver-side sources the
  * file is small by construction; rows enter Spark via
  * `createDataFrame` and the distributed pipeline starts at the first
  * transformation.
  */
object Gpkg {

  // ------------------------------------------------------------------
  // SQLite container reader (read-only)
  // ------------------------------------------------------------------

  /** Minimal read-only SQLite file walker: enough of the format to read
    * whole tables (the GPKG profile never needs indexes or WAL — a
    * `.gpkg` is a plain rollback-journal database).
    */
  private[graft] final class SqliteDb(bytes: Array[Byte]) {
    require(bytes.length > 100 &&
      new String(bytes, 0, 15, "US-ASCII") == "SQLite format 3",
      "not a SQLite (.gpkg) file: bad magic")
    private def u16be(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    private def u32be(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    /** (value, bytesConsumed); SQLite varints are big-endian 7-bit. */
    private def varint(o: Int): (Long, Int) = {
      var v = 0L; var i = 0
      while (i < 8) {
        val b = bytes(o + i) & 0xff
        v = (v << 7) | (b & 0x7f)
        i += 1
        if ((b & 0x80) == 0) return (v, i)
      }
      ((v << 8) | (bytes(o + 8) & 0xff), 9)
    }

    val pageSize: Int = { val v = u16be(16); if (v == 1) 65536 else v }
    private val usable = pageSize - (bytes(20) & 0xff)
    private def pageOff(n: Int): Int = (n - 1) * pageSize

    /** Assemble a cell's full payload, following the overflow chain when
      * the local portion is truncated (spec: X = U-35 for table leaves;
      * spilled cells keep K or M local bytes then chain 4-byte-linked
      * overflow pages).
      */
    private def payload(o: Int, p: Long): (Array[Byte], Int) = {
      val x = usable - 35
      if (p <= x) {
        (java.util.Arrays.copyOfRange(bytes, o, o + p.toInt), p.toInt)
      } else {
        val m = ((usable - 12) * 32 / 255) - 23
        val k = m + ((p - m) % (usable - 4)).toInt
        val local = if (k <= x) k else m
        val out = new ByteArrayOutputStream(p.toInt)
        out.write(bytes, o, local)
        var ov = u32be(o + local).toInt
        var remaining = p.toInt - local
        while (ov != 0 && remaining > 0) {
          val po = pageOff(ov)
          val take = math.min(remaining, usable - 4)
          out.write(bytes, po + 4, take)
          remaining -= take
          ov = u32be(po).toInt
        }
        (out.toByteArray, local + 4)
      }
    }

    /** Decode one record (varint serial-type header + body). */
    private def record(pl: Array[Byte]): IndexedSeq[Any] = {
      def pvarint(o: Int): (Long, Int) = {
        var v = 0L; var i = 0
        while (i < 8) {
          val b = pl(o + i) & 0xff
          v = (v << 7) | (b & 0x7f)
          i += 1
          if ((b & 0x80) == 0) return (v, i)
        }
        ((v << 8) | (pl(o + 8) & 0xff), 9)
      }
      val (hlen, n0) = pvarint(0)
      val serials = mutable.ArrayBuffer.empty[Long]
      var ho = n0
      while (ho < hlen) {
        val (s, n) = pvarint(ho); serials += s; ho += n
      }
      var bo = hlen.toInt
      def beInt(width: Int): Long = {
        var v = 0L
        (0 until width).foreach(i => v = (v << 8) | (pl(bo + i) & 0xff))
        // sign-extend
        val shift = 64 - width * 8
        (v << shift) >> shift
      }
      serials.map { s =>
        val v: Any = s match {
          case 0 => null
          case 1 | 2 | 3 | 4 => val w = s.toInt; val r = beInt(w); bo += w; r
          case 5 => val r = beInt(6); bo += 6; r
          case 6 => val r = beInt(8); bo += 8; r
          case 7 =>
            val r = java.lang.Double.longBitsToDouble(
              (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (pl(bo + i) & 0xff)))
            bo += 8; r
          case 8 => 0L
          case 9 => 1L
          case n if n >= 12 && n % 2 == 0 =>
            val w = ((n - 12) / 2).toInt
            val r = java.util.Arrays.copyOfRange(pl, bo, bo + w); bo += w; r
          case n if n >= 13 =>
            val w = ((n - 13) / 2).toInt
            val r = new String(pl, bo, w, "UTF-8"); bo += w; r
          case other =>
            throw new IllegalArgumentException(s"reserved serial type $other")
        }
        v
      }.toIndexedSeq
    }

    /** Depth-first walk of a table b-tree, in rowid order. */
    def walkTable(root: Int)(f: (Long, IndexedSeq[Any]) => Unit): Unit = {
      val base = pageOff(root)
      val h = if (root == 1) base + 100 else base
      val ptype = bytes(h) & 0xff
      val nCells = u16be(h + 3)
      ptype match {
        case 0x05 => // table interior
          val ptrBase = h + 12
          (0 until nCells).foreach { c =>
            val cellOff = base + u16be(ptrBase + c * 2)
            walkTable(u32be(cellOff).toInt)(f)
          }
          walkTable(u32be(h + 8).toInt)(f)
        case 0x0D => // table leaf
          val ptrBase = h + 8
          (0 until nCells).foreach { c =>
            var o = base + u16be(ptrBase + c * 2)
            val (p, n1) = varint(o); o += n1
            val (rowid, n2) = varint(o); o += n2
            val (pl, _) = payload(o, p)
            f(rowid, record(pl))
          }
        case other =>
          throw new IllegalArgumentException(
            s"page $root: not a table b-tree page (type 0x${other.toHexString})")
      }
    }

    /** sqlite_master: (name, rootpage, create-sql) for every table. */
    def tables(): Map[String, (Int, String)] = {
      val out = mutable.LinkedHashMap.empty[String, (Int, String)]
      walkTable(1) { (_, vs) =>
        if (vs.length >= 5 && vs(0) == "table")
          out(vs(1).asInstanceOf[String]) =
            (vs(3).asInstanceOf[Long].toInt, vs(4).asInstanceOf[String])
      }
      out.toMap
    }
  }

  /** Column (name, declaredType, isIntegerPrimaryKey) triples from a
    * CREATE TABLE statement. Top-level-comma split; table-level
    * constraint clauses are skipped. An INTEGER PRIMARY KEY column
    * aliases the rowid: its record slot is NULL and the value is the
    * cell's rowid (SQLite spec §2.1).
    */
  private[graft] def parseCreate(sql: String): Seq[(String, String, Boolean)] = {
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    require(open >= 0 && close > open, s"unparseable CREATE TABLE: $sql")
    val body = sql.substring(open + 1, close)
    val parts = mutable.ArrayBuffer.empty[String]
    var depth = 0; var last = 0
    body.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => parts += body.substring(last, i); last = i + 1
        case _ =>
      }
    }
    parts += body.substring(last)
    val constraintStart = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    parts.map(_.trim.replaceAll("\\s+", " ")).filter(_.nonEmpty).flatMap { defn =>
      // identifier may be quoted ("my col", `x`, [x]) and contain spaces
      val (name, rest) = defn.head match {
        case q @ ('"' | '`') =>
          val end = defn.indexOf(q, 1)
          (defn.substring(1, end), defn.substring(end + 1).trim)
        case '[' =>
          val end = defn.indexOf(']', 1)
          (defn.substring(1, end), defn.substring(end + 1).trim)
        case _ =>
          val end = defn.indexOf(' ')
          if (end < 0) (defn, "") else (defn.substring(0, end), defn.substring(end + 1).trim)
      }
      if (constraintStart.contains(name.toUpperCase)) None
      else {
        val declared = rest.split("\\s+").headOption.getOrElse("").toUpperCase
        val u = defn.toUpperCase
        val ipk = u.contains("INTEGER") && u.contains("PRIMARY KEY")
        Some((name, declared, ipk))
      }
    }.toSeq
  }

  private def sparkType(declared: String): DataType = {
    val u = declared.toUpperCase
    if (u.contains("INT")) LongType
    else if (u.contains("REAL") || u.contains("FLOA") || u.contains("DOUB")) DoubleType
    else if (u.contains("TEXT") || u.contains("CHAR") || u.contains("CLOB")) StringType
    else BinaryType // BLOB and GPKG geometry-type names (POINT, GEOMETRY, ...)
  }

  /** SQLite stores by value class, not declared type: a REAL-affinity
    * column holds whole-number floats as INTEGER serials on disk
    * (fileformat2 §2.1 "REAL values that can be represented exactly as
    * integers"), so coerce decoded values to the Spark column type.
    */
  private def coerce(raw: Any, target: DataType): Any = (raw, target) match {
    case (null, _) => null
    case (v: Long, DoubleType) => v.toDouble
    case (v: Double, LongType) if v == v.toLong.toDouble => v.toLong
    case (v: Long, StringType) => v.toString
    case (v: Double, StringType) => v.toString
    case (v, _) => v
  }

  // ------------------------------------------------------------------
  // GPKG geometry BLOB (OGC 12-128r17 §2.1.3)
  // ------------------------------------------------------------------

  /** Strip the GeoPackage binary header (magic GP, version, flags,
    * srs_id, optional envelope) and return the standard WKB payload.
    */
  private[graft] def stripGeometryHeader(b: Array[Byte]): Array[Byte] = {
    require(b.length >= 8 && b(0) == 'G'.toByte && b(1) == 'P'.toByte,
      "not a GPKG geometry blob")
    val flags = b(3) & 0xff
    val envLen = ((flags >> 1) & 0x07) match {
      case 0 => 0
      case 1 => 32 // [minx maxx miny maxy]
      case 2 | 3 => 48 // + z or m range
      case 4 => 64 // + z and m ranges
      case other => throw new IllegalArgumentException(
        s"invalid GPKG envelope indicator $other")
    }
    java.util.Arrays.copyOfRange(b, 8 + envLen, b.length)
  }

  /** srs_id carried in a GPKG geometry blob header. */
  private[graft] def geometrySrsId(b: Array[Byte]): Int = {
    val little = (b(3) & 0x01) != 0
    if (little)
      (b(4) & 0xff) | ((b(5) & 0xff) << 8) | ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
    else
      ((b(4) & 0xff) << 24) | ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
  }

  // ------------------------------------------------------------------
  // reader
  // ------------------------------------------------------------------

  /** Read a feature layer. `layer = None` picks the first (often only)
    * entry in `gpkg_geometry_columns`, like the reference's default.
    */
  def read(spark: SparkSession, path: String,
      layer: Option[String] = None): DataFrame = {
    val (schema, rows) = parseRows(path, layer)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(rows.size, spark.sparkContext.defaultParallelism))),
      schema)
  }

  /** Session-free parse (runs on executors under
    * [[VectorFiles.read]]'s one-task-per-file distribution).
    */
  private[graft] def parseRows(path: String,
      layer: Option[String] = None): (StructType, Seq[Row]) = {
    val db = new SqliteDb(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val tables = db.tables()
    val gc = tables.getOrElse("gpkg_geometry_columns",
      throw new IllegalArgumentException(
        s"$path has no gpkg_geometry_columns table — not a GeoPackage"))
    val layers = mutable.ArrayBuffer.empty[(String, String)]
    db.walkTable(gc._1) { (_, vs) =>
      layers += ((vs(0).asInstanceOf[String], vs(1).asInstanceOf[String]))
    }
    val (tbl, geomCol) = layer match {
      case Some(l) => layers.find(_._1 == l).getOrElse(
        throw new IllegalArgumentException(
          s"layer $l not in ${layers.map(_._1).mkString(",")}"))
      case None => layers.headOption.getOrElse(
        throw new IllegalArgumentException(s"$path has no feature layers"))
    }
    val (root, sql) = tables.getOrElse(tbl,
      throw new IllegalArgumentException(s"feature table $tbl missing"))
    val cols = parseCreate(sql)
    val schema = StructType(cols.map { case (n, declared, _) =>
      StructField(n,
        if (n == geomCol) BinaryType else sparkType(declared),
        nullable = true)
    })
    val rows = mutable.ArrayBuffer.empty[Row]
    db.walkTable(root) { (rowid, vs) =>
      val vals = cols.zipWithIndex.map { case ((n, _, ipk), i) =>
        val raw = if (i < vs.length) vs(i) else null
        if (ipk && raw == null) rowid
        else if (n == geomCol && raw != null)
          stripGeometryHeader(raw.asInstanceOf[Array[Byte]])
        else coerce(raw, schema(i).dataType)
      }
      rows += Row.fromSeq(vals)
    }
    (schema, rows.toSeq)
  }

  // ------------------------------------------------------------------
  // writer (test fixtures + S5 sink completeness)
  // ------------------------------------------------------------------

  private def varintBytes(v: Long): Array[Byte] = {
    require(v >= 0)
    if (v == 0) return Array(0.toByte)
    val groups = mutable.ArrayBuffer.empty[Int]
    var x = v
    while (x != 0) { groups += (x & 0x7f).toInt; x >>>= 7 }
    val out = groups.reverse.zipWithIndex.map { case (g, i) =>
      (if (i < groups.length - 1) g | 0x80 else g).toByte
    }
    out.toArray
  }

  /** Encode one record. Values: null, Long, Double, String,
    * Array[Byte]; integers always use the 8-byte serial (simple and
    * valid — readers must accept any width).
    */
  private def encodeRecord(vals: Seq[Any]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val serials = vals.map {
      case null => 0L
      case _: Long => 6L
      case _: Double => 7L
      case s: String => 13L + 2L * s.getBytes("UTF-8").length
      case b: Array[Byte] => 12L + 2L * b.length
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }
    vals.foreach {
      case null =>
      case v: Long => (7 to 0 by -1).foreach(i => body.write(((v >> (i * 8)) & 0xff).toInt))
      case d: Double =>
        val bits = java.lang.Double.doubleToLongBits(d)
        (7 to 0 by -1).foreach(i => body.write(((bits >> (i * 8)) & 0xff).toInt))
      case s: String => body.write(s.getBytes("UTF-8"))
      case b: Array[Byte] => body.write(b)
    }
    val serialBytes = serials.flatMap(varintBytes).toArray
    // header length varint includes itself; one byte is enough below 128
    val hlen = serialBytes.length + 1
    require(hlen < 128, "record header too long for fixture writer")
    val out = new ByteArrayOutputStream()
    out.write(hlen)
    out.write(serialBytes)
    out.write(body.toByteArray)
    out.toByteArray
  }

  /** GPKG geometry blob for a WKB payload: GP magic, version 0,
    * little-endian flags, no envelope.
    */
  private[graft] def geometryBlob(wkb: Array[Byte], srsId: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(8 + wkb.length)
    out.write('G'); out.write('P'); out.write(0)
    out.write(0x01) // flags: little-endian header, no envelope
    out.write(srsId & 0xff); out.write((srsId >> 8) & 0xff)
    out.write((srsId >> 16) & 0xff); out.write((srsId >> 24) & 0xff)
    out.write(wkb)
    out.toByteArray
  }

  private val PageSize = 4096

  /** One table b-tree from (rowid, record) pairs: returns the page list
    * (leaves then, when needed, one interior root — fine for fixture
    * scale) and the root's index within it.
    */
  private def buildTable(cells: Seq[(Long, Array[Byte])],
      firstPageNo: Int): (Seq[Array[Byte]], Int) = {
    val usable = PageSize
    val x = usable - 35
    // cell bytes on a leaf: varint(P) varint(rowid) payload [overflow ptr]
    def leafCell(rowid: Long, rec: Array[Byte],
        overflowPages: mutable.ArrayBuffer[Array[Byte]],
        nextOverflowNo: () => Int): Array[Byte] = {
      val p = rec.length
      val out = new ByteArrayOutputStream()
      out.write(varintBytes(p))
      out.write(varintBytes(rowid))
      if (p <= x) out.write(rec)
      else {
        val m = ((usable - 12) * 32 / 255) - 23
        val k = m + ((p - m) % (usable - 4))
        val local = if (k <= x) k else m
        out.write(rec, 0, local)
        // overflow chain
        var off = local
        val pageNos = mutable.ArrayBuffer.empty[Int]
        while (off < p) {
          val take = math.min(usable - 4, p - off)
          val pg = new Array[Byte](PageSize)
          System.arraycopy(rec, off, pg, 4, take)
          pageNos += nextOverflowNo() // number BEFORE appending: N+1+buf.len
          overflowPages += pg
          off += take
        }
        // link the chain: page k points to k+1, last points to 0
        pageNos.indices.foreach { i =>
          val next = if (i + 1 < pageNos.length) pageNos(i + 1) else 0
          val pg = overflowPages(overflowPages.length - pageNos.length + i)
          pg(0) = ((next >> 24) & 0xff).toByte; pg(1) = ((next >> 16) & 0xff).toByte
          pg(2) = ((next >> 8) & 0xff).toByte; pg(3) = (next & 0xff).toByte
        }
        val first = pageNos.head
        out.write((first >> 24) & 0xff); out.write((first >> 16) & 0xff)
        out.write((first >> 8) & 0xff); out.write(first & 0xff)
      }
      out.toByteArray
    }

    def leafPage(pageCells: Seq[Array[Byte]], headerAt: Int): Array[Byte] = {
      val pg = new Array[Byte](PageSize)
      pg(headerAt) = 0x0D
      pg(headerAt + 3) = ((pageCells.length >> 8) & 0xff).toByte
      pg(headerAt + 4) = (pageCells.length & 0xff).toByte
      var content = PageSize
      val ptrs = mutable.ArrayBuffer.empty[Int]
      pageCells.foreach { c =>
        content -= c.length
        System.arraycopy(c, 0, pg, content, c.length)
        ptrs += content
      }
      pg(headerAt + 5) = ((content >> 8) & 0xff).toByte
      pg(headerAt + 6) = (content & 0xff).toByte
      ptrs.zipWithIndex.foreach { case (p, i) =>
        pg(headerAt + 8 + i * 2) = ((p >> 8) & 0xff).toByte
        pg(headerAt + 8 + i * 2 + 1) = (p & 0xff).toByte
      }
      pg
    }

    // lay out leaves greedily; overflow pages interleave after each leaf
    val pages = mutable.ArrayBuffer.empty[Array[Byte]]
    val leafInfo = mutable.ArrayBuffer.empty[(Int, Long)] // (pageNo, maxRowid)
    var current = mutable.ArrayBuffer.empty[Array[Byte]]
    var currentBytes = 0
    var maxRowid = 0L
    val overflowBuf = mutable.ArrayBuffer.empty[Array[Byte]]
    def flushLeaf(): Unit = {
      if (current.nonEmpty) {
        val pageNo = firstPageNo + pages.length
        pages += leafPage(current.toSeq, 0)
        pages ++= overflowBuf // chain numbers were assigned inline
        leafInfo += ((pageNo, maxRowid))
        current = mutable.ArrayBuffer.empty
        overflowBuf.clear()
        currentBytes = 0
      }
    }
    cells.foreach { case (rowid, rec) =>
      // Decide the leaf break from the cell's on-leaf size BEFORE building
      // it: leafCell assigns overflow page numbers relative to the leaf the
      // cell lands on, so the flush must happen first or a discarded build
      // leaves mis-numbered chain pages in overflowBuf.
      val p = rec.length
      val local =
        if (p <= x) p
        else {
          val m = ((usable - 12) * 32 / 255) - 23
          val k = m + ((p - m) % (usable - 4))
          if (k <= x) k else m
        }
      val cellLen = varintBytes(p).length + varintBytes(rowid).length +
        local + (if (p <= x) 0 else 4)
      if (current.nonEmpty &&
          8 + (current.length + 1) * 2 + currentBytes + cellLen > PageSize)
        flushLeaf()
      val cell = leafCell(rowid, rec, overflowBuf,
        () => firstPageNo + pages.length + 1 + overflowBuf.length)
      current += cell; currentBytes += cell.length; maxRowid = rowid
    }
    flushLeaf()

    if (leafInfo.length == 1) (pages.toSeq, leafInfo(0)._1)
    else {
      // one interior root: left cells for all but the last leaf
      val rootNo = firstPageNo + pages.length
      val pg = new Array[Byte](PageSize)
      pg(0) = 0x05
      val cells2 = leafInfo.init.map { case (no, rid) =>
        val out = new ByteArrayOutputStream()
        out.write((no >> 24) & 0xff); out.write((no >> 16) & 0xff)
        out.write((no >> 8) & 0xff); out.write(no & 0xff)
        out.write(varintBytes(rid))
        out.toByteArray
      }
      pg(3) = ((cells2.length >> 8) & 0xff).toByte
      pg(4) = (cells2.length & 0xff).toByte
      val right = leafInfo.last._1
      pg(8) = ((right >> 24) & 0xff).toByte; pg(9) = ((right >> 16) & 0xff).toByte
      pg(10) = ((right >> 8) & 0xff).toByte; pg(11) = (right & 0xff).toByte
      var content = PageSize
      cells2.zipWithIndex.foreach { case (c, i) =>
        content -= c.length
        System.arraycopy(c, 0, pg, content, c.length)
        pg(12 + i * 2) = ((content >> 8) & 0xff).toByte
        pg(12 + i * 2 + 1) = (content & 0xff).toByte
      }
      pg(5) = ((content >> 8) & 0xff).toByte
      pg(6) = (content & 0xff).toByte
      pages += pg
      (pages.toSeq, rootNo)
    }
  }

  /** Write (name, x, y)-style features as a real GeoPackage: SQLite
    * container with `gpkg_contents` + `gpkg_geometry_columns` + one
    * feature table of POINT geometries (GPKG blobs wrapping WKB from
    * [[graft.geo.Wkb]]).
    *
    * `df` columns: any mix of long/double/string attributes plus ONE
    * pair named `x`/`y` (EPSG:27700 metres) that becomes the geometry.
    */
  def write(df: DataFrame, path: String, table: String = "features",
      srsId: Int = 27700): Unit = {
    val names = df.schema.fieldNames
    require(names.contains("x") && names.contains("y"),
      "Gpkg.write expects x/y columns for the point geometry")
    val attrNames = names.filterNot(n => n == "x" || n == "y")
    val xi = names.indexOf("x"); val yi = names.indexOf("y")
    val rows = df.collect()

    // ---- feature table cells ----
    val featCols = attrNames.map { n =>
      val t = df.schema(n).dataType match {
        case LongType | IntegerType => "INTEGER"
        case DoubleType | FloatType => "REAL"
        case _ => "TEXT"
      }
      s""""$n" $t"""
    }
    val featSql =
      s"""CREATE TABLE "$table" (fid INTEGER PRIMARY KEY, ${featCols.mkString(", ")}, "geom" POINT)"""
    val featCells = rows.zipWithIndex.map { case (r, i) =>
      val attrs: Seq[Any] = attrNames.map { n =>
        r.get(names.indexOf(n)) match {
          case null => null
          case v: Long => v
          case v: Int => v.toLong
          case v: Double => v
          case v: Float => v.toDouble
          case v => v.toString
        }
      }.toSeq
      val wkb = graft.geo.Wkb.write(graft.geo.Wkb.point(
        r.get(xi).toString.toDouble, r.get(yi).toString.toDouble))
      val rec = encodeRecord((null +: attrs) :+ geometryBlob(wkb, srsId))
      ((i + 1).toLong, rec)
    }.toSeq

    // ---- metadata tables ----
    val contentsSql =
      """CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, data_type TEXT, identifier TEXT, description TEXT, last_change TEXT, min_x REAL, min_y REAL, max_x REAL, max_y REAL, srs_id INTEGER)"""
    val contentsCells = Seq((1L, encodeRecord(Seq(
      table, "features", table, "graft fixture", "2026-01-01T00:00:00Z",
      null, null, null, null, srsId.toLong))))
    val geomColsSql =
      """CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, z INTEGER, m INTEGER)"""
    val geomColsCells = Seq((1L, encodeRecord(Seq(
      table, "geom", "POINT", srsId.toLong, 0L, 0L))))
    val srsSql =
      """CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT, srs_id INTEGER PRIMARY KEY, organization TEXT, organization_coordsys_id INTEGER, definition TEXT, description TEXT)"""
    val srsCells = Seq((srsId.toLong, encodeRecord(Seq(
      "OSGB36 / British National Grid", null, "EPSG", srsId.toLong,
      "PROJCS[\"OSGB36 / British National Grid\"]", null))))

    // ---- page layout: page 1 = sqlite_master; tables follow ----
    // build in two passes because sqlite_master needs final root pages
    def layout(): Array[Byte] = {
      var nextPage = 2
      val tablePages = mutable.ArrayBuffer.empty[Array[Byte]]
      val roots = mutable.LinkedHashMap.empty[String, (Int, String)]
      Seq(
        ("gpkg_spatial_ref_sys", srsSql, srsCells),
        ("gpkg_contents", contentsSql, contentsCells),
        ("gpkg_geometry_columns", geomColsSql, geomColsCells),
        (table, featSql, featCells)
      ).foreach { case (name, sql, cells) =>
        val (pages, root) = buildTable(cells, nextPage)
        tablePages ++= pages
        roots(name) = (root, sql)
        nextPage += pages.length
      }
      // sqlite_master rows: (type, name, tbl_name, rootpage, sql)
      val masterCells = roots.zipWithIndex.map { case ((name, (root, sql)), i) =>
        ((i + 1).toLong,
          encodeRecord(Seq("table", name, name, root.toLong, sql)))
      }.toSeq
      // page 1 leaf with the header region reserved (cells must fit)
      val pg1 = new Array[Byte](PageSize)
      val h = 100
      pg1(h) = 0x0D
      pg1(h + 3) = ((masterCells.length >> 8) & 0xff).toByte
      pg1(h + 4) = (masterCells.length & 0xff).toByte
      var content = PageSize
      val cellBytes = masterCells.map { case (rowid, rec) =>
        val out = new ByteArrayOutputStream()
        out.write(varintBytes(rec.length)); out.write(varintBytes(rowid))
        out.write(rec)
        out.toByteArray
      }
      cellBytes.zipWithIndex.foreach { case (c, i) =>
        content -= c.length
        require(content > h + 8 + cellBytes.length * 2,
          "sqlite_master overflowed page 1 — fixture writer limit")
        System.arraycopy(c, 0, pg1, content, c.length)
        pg1(h + 8 + i * 2) = ((content >> 8) & 0xff).toByte
        pg1(h + 8 + i * 2 + 1) = (content & 0xff).toByte
      }
      pg1(h + 5) = ((content >> 8) & 0xff).toByte
      pg1(h + 6) = (content & 0xff).toByte

      val nPages = 1 + tablePages.length
      // 100-byte database header
      val magic = "SQLite format 3".getBytes("US-ASCII")
      System.arraycopy(magic, 0, pg1, 0, magic.length) // [15] stays 0
      pg1(16) = ((PageSize >> 8) & 0xff).toByte; pg1(17) = (PageSize & 0xff).toByte
      pg1(18) = 1; pg1(19) = 1 // rollback-journal read/write versions
      pg1(21) = 64; pg1(22) = 32; pg1(23) = 32 // payload fractions (fixed)
      def be32(off: Int, v: Int): Unit = {
        pg1(off) = ((v >> 24) & 0xff).toByte; pg1(off + 1) = ((v >> 16) & 0xff).toByte
        pg1(off + 2) = ((v >> 8) & 0xff).toByte; pg1(off + 3) = (v & 0xff).toByte
      }
      be32(24, 1) // change counter
      be32(28, nPages)
      be32(40, 1) // schema cookie
      be32(44, 1) // schema format 1
      be32(48, 0)
      be32(56, 1) // UTF-8
      be32(92, 1) // version-valid-for
      be32(96, 3045001) // library version stamp

      val out = new ByteArrayOutputStream(nPages * PageSize)
      out.write(pg1)
      tablePages.foreach(out.write)
      out.toByteArray
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), layout())
  }
}
