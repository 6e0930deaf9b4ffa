package graft.input

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}

import scala.collection.mutable

/** GeoJSON vector source (reference S6: the generic GDAL vector path's
  * E2E matrix includes `.geojson` — `tests/test_dataframe/
  * test_pipeline.py:38+`). Parsed against RFC 7946: a FeatureCollection
  * of Features, each with a `properties` object (flattened to typed
  * columns) and a `geometry` of type Point / MultiPoint / LineString /
  * MultiLineString / Polygon / MultiPolygon with nested coordinate
  * arrays, converted to JTS and emitted as raw WKB `BinaryType` — the
  * same output contract as the other vector sources (S5 GPKG,
  * Shapefile).
  *
  * The JSON itself is read by a small recursive-descent parser (no JSON
  * library ships beyond Spark's row-oriented reader, whose schema
  * inference cannot type GeoJSON's heterogeneously-nested coordinate
  * arrays). Property typing: all-integral numbers -> long, any
  * fractional -> double, true/false -> boolean, else string; properties
  * missing from a feature are null.
  */
object GeoJson {

  // ------------------------------------------------------------------
  // minimal JSON parser (objects keep insertion order)
  // ------------------------------------------------------------------

  private[graft] sealed trait JValue
  private[graft] case object JNull extends JValue
  private[graft] final case class JBool(v: Boolean) extends JValue
  private[graft] final case class JNum(raw: String) extends JValue {
    def toDouble: Double = raw.toDouble
    def isIntegral: Boolean =
      !raw.exists(c => c == '.' || c == 'e' || c == 'E')
  }
  private[graft] final case class JStr(v: String) extends JValue
  private[graft] final case class JArr(vs: Vector[JValue]) extends JValue
  private[graft] final case class JObj(vs: Vector[(String, JValue)]) extends JValue {
    lazy val map: Map[String, JValue] = vs.toMap
    def get(k: String): Option[JValue] = map.get(k)
  }

  private[graft] def parseJson(s: String): JValue = {
    var i = 0
    def err(msg: String) =
      throw new IllegalArgumentException(s"GeoJSON parse error at $i: $msg")
    def ws(): Unit =
      while (i < s.length && (s(i) == ' ' || s(i) == '\t' || s(i) == '\n' || s(i) == '\r')) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s(i) != c) err(s"expected '$c'")
      i += 1
    }
    def value(): JValue = {
      ws()
      if (i >= s.length) err("unexpected end")
      s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => require(s.startsWith("true", i), "bad literal"); i += 4; JBool(true)
        case 'f' => require(s.startsWith("false", i), "bad literal"); i += 5; JBool(false)
        case 'n' => require(s.startsWith("null", i), "bad literal"); i += 4; JNull
        case _ => num()
      }
    }
    def obj(): JObj = {
      expect('{'); ws()
      val out = Vector.newBuilder[(String, JValue)]
      if (i < s.length && s(i) == '}') { i += 1; return JObj(out.result()) }
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        out += ((k, value()))
        ws()
        if (i < s.length && s(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      JObj(out.result())
    }
    def arr(): JArr = {
      expect('['); ws()
      val out = Vector.newBuilder[JValue]
      if (i < s.length && s(i) == ']') { i += 1; return JArr(out.result()) }
      var done = false
      while (!done) {
        out += value()
        ws()
        if (i < s.length && s(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      JArr(out.result())
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => err(s"bad escape \\$other")
          }
          i += 1
        } else { sb += s(i); i += 1 }
      }
      expect('"')
      sb.toString
    }
    def num(): JNum = {
      val start = i
      if (i < s.length && (s(i) == '-' || s(i) == '+')) i += 1
      while (i < s.length &&
        (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
          s(i) == '-' || s(i) == '+')) i += 1
      if (i == start) err("expected number")
      JNum(s.substring(start, i))
    }
    val v = value(); ws()
    if (i != s.length) err("trailing content")
    v
  }

  // ------------------------------------------------------------------
  // geometry (RFC 7946 §3.1)
  // ------------------------------------------------------------------

  private val gf = new GeometryFactory()

  private def coord(v: JValue): Coordinate = v match {
    case JArr(xs) if xs.length >= 2 =>
      new Coordinate(xs(0).asInstanceOf[JNum].toDouble,
        xs(1).asInstanceOf[JNum].toDouble)
    case other => throw new IllegalArgumentException(s"bad position: $other")
  }
  private def coords(v: JValue): Array[Coordinate] =
    v.asInstanceOf[JArr].vs.map(coord).toArray

  private[graft] def toGeometry(g: JValue): Geometry = g match {
    case JNull => null
    case o: JObj =>
      val typ = o.get("type").collect { case JStr(t) => t }.getOrElse(
        throw new IllegalArgumentException("geometry without type"))
      val cs = o.get("coordinates").getOrElse(
        throw new IllegalArgumentException(s"$typ without coordinates"))
      typ match {
        case "Point" => gf.createPoint(coord(cs))
        case "MultiPoint" => gf.createMultiPointFromCoords(coords(cs))
        case "LineString" => gf.createLineString(coords(cs))
        case "MultiLineString" =>
          gf.createMultiLineString(
            cs.asInstanceOf[JArr].vs.map(l => gf.createLineString(coords(l))).toArray)
        case "Polygon" => polygon(cs.asInstanceOf[JArr])
        case "MultiPolygon" =>
          gf.createMultiPolygon(
            cs.asInstanceOf[JArr].vs.map(p => polygon(p.asInstanceOf[JArr])).toArray)
        case other =>
          throw new IllegalArgumentException(s"unsupported geometry type $other")
      }
    case other => throw new IllegalArgumentException(s"bad geometry: $other")
  }

  private def polygon(rings: JArr) = {
    val rs = rings.vs.map(r => gf.createLinearRing(coords(r)))
    gf.createPolygon(rs.head, rs.tail.toArray)
  }

  // ------------------------------------------------------------------
  // reader
  // ------------------------------------------------------------------

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
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val root = parseJson(text) match {
      case o: JObj => o
      case _ => throw new IllegalArgumentException(s"$path: not a JSON object")
    }
    val features: Vector[JObj] = root.get("type") match {
      case Some(JStr("FeatureCollection")) =>
        root.get("features").collect { case JArr(fs) => fs.collect { case f: JObj => f } }
          .getOrElse(Vector.empty)
      case Some(JStr("Feature")) => Vector(root)
      case other =>
        throw new IllegalArgumentException(s"$path: unsupported root type $other")
    }
    // union the property keys in first-seen order; type = widest seen
    val keyOrder = mutable.LinkedHashMap.empty[String, DataType]
    def widen(a: DataType, b: DataType): DataType =
      if (a == b) a
      else if (Set(a, b) == Set[DataType](LongType, DoubleType)) DoubleType
      else StringType
    features.foreach { f =>
      f.get("properties").collect { case p: JObj => p.vs }.getOrElse(Vector.empty)
        .foreach { case (k, v) =>
          val t = v match {
            case n: JNum => if (n.isIntegral) LongType else DoubleType
            case _: JBool => BooleanType
            case JNull => keyOrder.getOrElse(k, NullType)
            case _ => StringType
          }
          if (t != NullType)
            keyOrder(k) = keyOrder.get(k).map(widen(_, t)).getOrElse(t)
          else if (!keyOrder.contains(k)) keyOrder(k) = NullType
        }
    }
    val props = keyOrder.toSeq.map { case (k, t) =>
      (k, if (t == NullType) StringType else t)
    }
    val schema = StructType(
      StructField("fid", LongType, nullable = false) +:
        props.map { case (k, t) => StructField(k, t, nullable = true) } :+
        StructField("geom", BinaryType, nullable = true))
    val rows = features.zipWithIndex.map { case (f, idx) =>
      val pm = f.get("properties").collect { case p: JObj => p.map }
        .getOrElse(Map.empty[String, JValue])
      val vals = props.map { case (k, t) =>
        pm.get(k) match {
          case None | Some(JNull) => null
          case Some(n: JNum) => t match {
            case LongType => n.toDouble.toLong
            case DoubleType => n.toDouble
            case _ => n.raw
          }
          case Some(JBool(b)) => if (t == BooleanType) b else b.toString
          case Some(JStr(v)) => v
          case Some(other) => other.toString
        }
      }
      val g = f.get("geometry").map(toGeometry).orNull
      Row.fromSeq((idx + 1L) +: vals :+
        (if (g == null) null else graft.geo.Wkb.write(g)))
    }
    (schema, rows)
  }

  // ------------------------------------------------------------------
  // writer (test fixtures): point features, same x/y contract as the
  // other fixture writers
  // ------------------------------------------------------------------

  def write(df: DataFrame, path: String): Unit = {
    val names = df.schema.fieldNames
    require(names.contains("x") && names.contains("y"),
      "GeoJson.write expects x/y columns for the point geometry")
    val attrNames = names.filterNot(n => n == "x" || n == "y")
    val xi = names.indexOf("x"); val yi = names.indexOf("y")
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jnum(d: Double): String =
      if (d == d.toLong.toDouble) d.toLong.toString else d.toString
    val feats = df.collect().map { r =>
      val props = attrNames.map { n =>
        val v = r.get(names.indexOf(n)) match {
          case null => "null"
          case v: Long => v.toString
          case v: Int => v.toString
          case v: Double => jnum(v)
          case v: Float => jnum(v.toDouble)
          case v: Boolean => v.toString
          case v => jstr(v.toString)
        }
        s"${jstr(n)}: $v"
      }.mkString(", ")
      val x = jnum(r.get(xi).toString.toDouble)
      val y = jnum(r.get(yi).toString.toDouble)
      s"""{"type": "Feature", "properties": {$props}, "geometry": {"type": "Point", "coordinates": [$x, $y]}}"""
    }
    val doc = feats.mkString(
      "{\"type\": \"FeatureCollection\", \"features\": [\n", ",\n", "\n]}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc)
  }
}
