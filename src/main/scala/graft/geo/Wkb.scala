package graft.geo

import org.locationtech.jts.geom.{Coordinate, Envelope, Geometry, GeometryFactory, PrecisionModel}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** WKB/WKT codec helpers over JTS (jts-core-1.20.0 ships in
  * /opt/spark/jars). Geometries are carried through Spark plans as
  * `BinaryType` WKB columns, matching the reference's geometry
  * representation (`tests/fixtures/dataframe/to_zarr.py:65`,
  * `_dataframe.py:628`).
  *
  * JTS reader/writer instances are not thread-safe — keep them
  * thread-local because expressions evaluate on many executor threads.
  */
object Wkb {
  val factory = new GeometryFactory(new PrecisionModel(), 27700)

  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter())

  def read(bytes: Array[Byte]): Geometry = wkbReader.get().read(bytes)
  def write(g: Geometry): Array[Byte] = wkbWriter.get().write(g)
  def readWkt(s: String): Geometry = wktReader.get().read(s)
  def writeWkt(g: Geometry): String = wktWriter.get().write(g)

  def point(x: Double, y: Double): Geometry =
    factory.createPoint(new Coordinate(x, y))

  /** Axis-aligned box polygon (shapely.geometry.box equivalent). */
  def box(minx: Double, miny: Double, maxx: Double, maxy: Double): Geometry =
    factory.toGeometry(new Envelope(minx, maxx, miny, maxy))
}
