package graft.input

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LinearRing}

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** ESRI Shapefile vector source (reference S6: the generic GDAL vector
  * path `read_vector_files`, `dataframe.py:196-197`, whose E2E pipeline
  * matrix includes `.shp` — `tests/test_dataframe/test_pipeline.py:38+`).
  * No GDAL ships in this image, so the format triple is parsed from
  * scratch against the PUBLIC specs: the ESRI Shapefile Technical
  * Description (July 1998) for `.shp`/`.shx` (mixed-endian 100-byte
  * header, 8-byte big-endian record headers, little-endian shape
  * records) and the dBASE III/IV layout for `.dbf` (32-byte field
  * descriptors, fixed-width ASCII records).
  *
  * Output contract matches the engine-wide S5/S6 shape: `fid` (shape
  * record number, 1-based), attribute columns typed from the dbf
  * descriptors (N/F with decimals -> double, N without -> long, C/D ->
  * string, L -> boolean), and the geometry as raw WKB `BinaryType`
  * ready for [[graft.geo.Wkb]] / the spatial operators. Like the other
  * driver-side sources the file is small by construction; rows enter
  * Spark via `createDataFrame` and the distributed pipeline starts at
  * the first transformation.
  */
object Shapefile {

  private val gf = new GeometryFactory()

  // ------------------------------------------------------------------
  // .shp reader
  // ------------------------------------------------------------------

  /** (recordNumber, geometry or null) pairs in file order. */
  private[graft] def readShp(bytes: Array[Byte]): Seq[(Int, Geometry)] = {
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, "not a shapefile: bad file code")
    val fileLen = be.getInt(24) * 2 // 16-bit words -> bytes
    val out = mutable.ArrayBuffer.empty[(Int, Geometry)]
    var off = 100
    while (off + 8 <= math.min(fileLen, bytes.length)) {
      val recNo = be.getInt(off)
      val contentLen = be.getInt(off + 4) * 2
      val le = ByteBuffer.wrap(bytes, off + 8, contentLen)
        .order(ByteOrder.LITTLE_ENDIAN)
      out += ((recNo, readShape(le)))
      off += 8 + contentLen
    }
    out.toSeq
  }

  private def readShape(b: ByteBuffer): Geometry = {
    val base = b.position()
    def d(o: Int): Double = b.getDouble(base + o)
    def i(o: Int): Int = b.getInt(base + o)
    i(0) match {
      case 0 => null // null shape
      case 1 => // Point
        gf.createPoint(new Coordinate(d(4), d(12)))
      case 8 => // MultiPoint: box, numPoints, points
        val n = i(36)
        gf.createMultiPoint(
          (0 until n).map(k =>
            gf.createPoint(new Coordinate(d(40 + k * 16), d(48 + k * 16)))).toArray)
      case 3 | 5 => // PolyLine | Polygon: box, numParts, numPoints, parts, points
        val shapeType = i(0)
        val nParts = i(36)
        val nPoints = i(40)
        val partStart = (0 until nParts).map(k => i(44 + k * 4))
        val ptsBase = 44 + nParts * 4
        def ring(from: Int, until: Int): Array[Coordinate] =
          (from until until).map(k =>
            new Coordinate(d(ptsBase + k * 16), d(ptsBase + k * 16 + 8))).toArray
        val parts = partStart.zipWithIndex.map { case (s, k) =>
          ring(s, if (k + 1 < nParts) partStart(k + 1) else nPoints)
        }
        if (shapeType == 3) {
          if (parts.length == 1) gf.createLineString(parts.head)
          else gf.createMultiLineString(
            parts.map(gf.createLineString).toArray)
        } else {
          // Polygon: rings are clockwise = outer, counter-clockwise =
          // hole (spec p.12); group holes under the outer ring that
          // contains them. JTS Orientation.isCCW gives ring direction.
          val rings = parts.map(p => gf.createLinearRing(p))
          val (outers, holes) = rings.partition(r =>
            !org.locationtech.jts.algorithm.Orientation.isCCW(
              r.getCoordinateSequence))
          if (outers.length == 1)
            gf.createPolygon(outers.head, holes.toArray)
          else {
            val polys = outers.map { o =>
              val shell = gf.createPolygon(o)
              val mine = holes.filter(h =>
                shell.contains(gf.createPoint(h.getCoordinateN(0))))
              gf.createPolygon(o, mine.toArray)
            }
            gf.createMultiPolygon(polys.toArray)
          }
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  // ------------------------------------------------------------------
  // .dbf reader
  // ------------------------------------------------------------------

  private[graft] case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private[graft] def readDbf(bytes: Array[Byte]): (Seq[DbfField], Seq[Seq[Any]]) = {
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = le.getInt(4)
    val headerSize = le.getShort(8) & 0xffff
    val recSize = le.getShort(10) & 0xffff
    val fields = mutable.ArrayBuffer.empty[DbfField]
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0d) {
      val nameEnd = (off until off + 11).find(bytes(_) == 0).getOrElse(off + 11)
      fields += DbfField(
        new String(bytes, off, nameEnd - off, "US-ASCII"),
        bytes(off + 11).toChar,
        bytes(off + 16) & 0xff,
        bytes(off + 17) & 0xff)
      off += 32
    }
    val rows = (0 until nRec).flatMap { r =>
      val ro = headerSize + r * recSize
      if (bytes(ro) == '*') None // deleted record
      else {
        var fo = ro + 1
        Some(fields.map { f =>
          val raw = new String(bytes, fo, f.len, "US-ASCII").trim
          fo += f.len
          val v: Any =
            if (raw.isEmpty) null
            else f.typ match {
              case 'N' | 'F' =>
                if (f.dec > 0 || raw.contains('.')) raw.toDouble else raw.toLong
              case 'L' => raw.head match {
                case 'T' | 't' | 'Y' | 'y' => true
                case 'F' | 'f' | 'N' | 'n' => false
                case _ => null
              }
              case _ => raw // C, D, and anything else stay strings
            }
          v
        }.toSeq)
      }
    }
    (fields.toSeq, rows)
  }

  private def sparkType(f: DbfField): DataType = f.typ match {
    case 'N' | 'F' => if (f.dec > 0) DoubleType else LongType
    case 'L' => BooleanType
    case _ => StringType
  }

  // ------------------------------------------------------------------
  // reader
  // ------------------------------------------------------------------

  /** Read `<base>.shp` + `<base>.dbf` (pass either the `.shp` path or
    * the extensionless base).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (schema, rows) = parseRows(path)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(rows.size, spark.sparkContext.defaultParallelism))),
      schema)
  }

  /** Session-free parse (runs on executors under
    * [[VectorFiles.read]]'s one-task-per-file distribution).
    */
  private[graft] def parseRows(path: String): (StructType, Seq[Row]) = {
    val base = if (path.toLowerCase.endsWith(".shp")) path.dropRight(4) else path
    val shpBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base + ".shp"))
    val shapes = readShp(shpBytes)
    val dbfPath = java.nio.file.Paths.get(base + ".dbf")
    val (fields, attrs) =
      if (java.nio.file.Files.exists(dbfPath))
        readDbf(java.nio.file.Files.readAllBytes(dbfPath))
      else (Seq.empty[DbfField], shapes.map(_ => Seq.empty[Any]))
    require(attrs.isEmpty || attrs.length == shapes.length,
      s"dbf has ${attrs.length} records but shp has ${shapes.length}")
    val schema = StructType(
      StructField("fid", LongType, nullable = false) +:
        fields.map(f => StructField(f.name, sparkType(f), nullable = true)) :+
        StructField("geom", BinaryType, nullable = true))
    val rows = shapes.zip(attrs).map { case ((recNo, g), a) =>
      Row.fromSeq(recNo.toLong +: a :+
        (if (g == null) null else graft.geo.Wkb.write(g)))
    }
    (schema, rows)
  }

  // ------------------------------------------------------------------
  // writer (test fixtures + S6 sink completeness): point features
  // ------------------------------------------------------------------

  /** Write point features as `<base>.shp` + `.shx` + `.dbf`. `df`
    * columns: any mix of long/double/string/boolean attributes plus ONE
    * `x`/`y` pair (planar CRS metres) that becomes the Point geometry.
    */
  def write(df: DataFrame, path: String): Unit = {
    val base = if (path.toLowerCase.endsWith(".shp")) path.dropRight(4) else path
    val names = df.schema.fieldNames
    require(names.contains("x") && names.contains("y"),
      "Shapefile.write expects x/y columns for the point geometry")
    val attrNames = names.filterNot(n => n == "x" || n == "y")
    val xi = names.indexOf("x"); val yi = names.indexOf("y")
    val rows = df.collect()
    val xs = rows.map(_.get(xi).toString.toDouble)
    val ys = rows.map(_.get(yi).toString.toDouble)

    // ---- .shp + .shx ----
    val recs = rows.indices.map { i =>
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1); b.putDouble(xs(i)); b.putDouble(ys(i))
      b.array()
    }
    def header(totalBytes: Int): Array[Byte] = {
      val h = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      h.putInt(0, 9994)
      h.putInt(24, totalBytes / 2)
      h.order(ByteOrder.LITTLE_ENDIAN)
      h.putInt(28, 1000) // version
      h.putInt(32, 1) // point
      if (rows.nonEmpty) {
        h.putDouble(36, xs.min); h.putDouble(44, ys.min)
        h.putDouble(52, xs.max); h.putDouble(60, ys.max)
      }
      h.array()
    }
    val shp = new ByteArrayOutputStream()
    val shx = new ByteArrayOutputStream()
    val shpTotal = 100 + recs.map(8 + _.length).sum
    shp.write(header(shpTotal))
    shx.write(header(100 + recs.length * 8))
    var off = 100
    recs.zipWithIndex.foreach { case (r, i) =>
      val rh = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      rh.putInt(i + 1); rh.putInt(r.length / 2)
      shp.write(rh.array()); shp.write(r)
      val xe = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      xe.putInt(off / 2); xe.putInt(r.length / 2)
      shx.write(xe.array())
      off += 8 + r.length
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(base + ".shp"), shp.toByteArray)
    java.nio.file.Files.write(java.nio.file.Paths.get(base + ".shx"), shx.toByteArray)

    // ---- .dbf ----
    def fieldSpec(n: String): DbfField = df.schema(n).dataType match {
      case LongType | IntegerType => DbfField(n.take(10), 'N', 18, 0)
      case DoubleType | FloatType => DbfField(n.take(10), 'N', 19, 6)
      case BooleanType => DbfField(n.take(10), 'L', 1, 0)
      case _ =>
        val w = math.max(1, math.min(254,
          rows.map(r => Option(r.get(names.indexOf(n))).map(_.toString.length).getOrElse(0)).max))
        DbfField(n.take(10), 'C', w, 0)
    }
    val fields = attrNames.map(fieldSpec)
    val recSize = 1 + fields.map(_.len).sum
    val headerSize = 32 + fields.length * 32 + 1
    val dbf = new ByteArrayOutputStream()
    val dh = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    dh.put(0, 0x03.toByte)
    dh.put(1, 126.toByte); dh.put(2, 1.toByte); dh.put(3, 1.toByte) // YYMMDD
    dh.putInt(4, rows.length)
    dh.putShort(8, headerSize.toShort)
    dh.putShort(10, recSize.toShort)
    dbf.write(dh.array())
    fields.foreach { f =>
      val fd = new Array[Byte](32)
      val nb = f.name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, fd, 0, math.min(10, nb.length))
      fd(11) = f.typ.toByte
      fd(16) = f.len.toByte
      fd(17) = f.dec.toByte
      dbf.write(fd)
    }
    dbf.write(0x0d)
    rows.foreach { r =>
      dbf.write(' ')
      attrNames.zip(fields).foreach { case (n, f) =>
        val raw = Option(r.get(names.indexOf(n))).map {
          case d: Double => f"$d%.6f"
          case fl: Float => f"${fl.toDouble}%.6f"
          case b: Boolean => if (b) "T" else "F"
          case v => v.toString
        }.getOrElse("")
        val cell =
          if (f.typ == 'N') raw.reverse.padTo(f.len, ' ').reverse // right-just
          else raw.padTo(f.len, ' ')
        dbf.write(cell.take(f.len).getBytes("US-ASCII"))
      }
    }
    dbf.write(0x1a) // EOF marker
    java.nio.file.Files.write(java.nio.file.Paths.get(base + ".dbf"), dbf.toByteArray)
  }
}
