package graft.raster

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.{ByteBuffer, ByteOrder}

/** Column spec in a tile store: raster dtype (reference ladder,
  * Constants.DtypeOrder), nodata sentinel, optional categorical lookup
  * string (stamped into attrs exactly like the reference's Zarr attrs,
  * `_dataframe.py:477-486`).
  */
case class ColumnSpec(name: String, dtype: String, nodata: Double,
    lookup: Option[String] = None)

object TileStore {
  /** JSON has no NaN literal; float nodata sentinels round-trip as the
    * string "NaN" (reference float dtypes use NaN nodata,
    * `_dataframe.py:217-219`).
    */
  object NanSerializer extends org.json4s.CustomSerializer[Double](_ => (
    {
      case org.json4s.JString("NaN") => Double.NaN
      case org.json4s.JDouble(d) => d
      case org.json4s.JInt(i) => i.toDouble
      case org.json4s.JLong(l) => l.toDouble
    },
    { case d: Double if d.isNaN => org.json4s.JString("NaN") }
  ))
}

/** Store header — the "skeleton" (reference `_create_dummy_dataset`,
  * `_dataframe.py:489-576`): canvas geometry + per-column dtype/nodata +
  * metadata/lineage attrs, written once on the driver before any tile.
  */
case class StoreHeader(
    crs: String,
    cellSize: Double,
    canvasMinX: Double, canvasMinY: Double,
    canvasMaxX: Double, canvasMaxY: Double,
    tileSize: Double,
    columns: Seq[ColumnSpec],
    attrs: Map[String, String])

/** Zarr-sink equivalent over a plain directory (no Zarr jar in-image):
  * `_store.json` header + one little-endian binary blob per (tile,
  * column) region, named by grid ref so concurrent executor writes land
  * in disjoint files — the same disjoint-region property the reference
  * relies on for `to_zarr(region=...)` (`_dataframe.py:579-673`).
  * [[Zarr.export]] re-encodes a store as a spec-level zarr v2 group
  * (the reference's actual on-disk format) when bit-format parity with
  * `to_zarr` output is needed.
  */
class TileStore(val path: String) {
  private val headerPath = Paths.get(path, "_store.json")
  implicit private val fmts: org.json4s.Formats =
    org.json4s.DefaultFormats + TileStore.NanSerializer

  def exists: Boolean = Files.exists(headerPath)

  def header: StoreHeader =
    org.json4s.jackson.Serialization.read[StoreHeader](
      new String(Files.readAllBytes(headerPath), UTF_8))

  /** K1 + K4: skeleton init with overwrite guard (reference
    * `_warn_zarr_overwrite` `_dataframe.py:692-710`).
    */
  def init(h: StoreHeader, overwrite: Boolean): Unit = {
    if (exists && !overwrite)
      throw new IllegalStateException(
        s"TileStore already exists at $path and overwrite=false")
    if (exists)
      System.err.println(s"[TileStore] warning: overwriting existing store at $path")
    Files.createDirectories(Paths.get(path))
    val json = org.json4s.jackson.Serialization.write(h)
    val tmp = Files.createTempFile(Paths.get(path), "hdr", ".json")
    Files.write(tmp, json.getBytes(UTF_8))
    Files.move(tmp, headerPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def bytesPer(dtype: String): Int = dtype match {
    case "uint8" | "int8" => 1
    case "uint16" | "int16" => 2
    case "uint32" | "int32" | "float32" => 4
    case _ => 8
  }

  /** K2: executor-side region write of one tile's array for one column.
    * Idempotent (fixed file per (tile, column)) — safe to replay on
    * resume. Regions are Zstd-compressed (like Zarr's compressed chunks):
    * sparse tiles — the common case at web scale, where most of a 10 km
    * tile is nodata — shrink ~100x on disk. Zstd level 1 measured 2.2x
    * faster to write, 1.5x faster to read and 28% smaller than the
    * round-1 Deflater(BEST_SPEED) on a 2%-dense uint8 region (BENCH.md);
    * reads sniff the frame magic so older DEFLATE stores stay readable.
    */
  def writeRegion(tileRef: String, column: String, dtype: String,
      data: Array[Double]): Unit = {
    val dir = Paths.get(path, s"tile=$tileRef")
    Files.createDirectories(dir)
    val bb = ByteBuffer.allocate(data.length * bytesPer(dtype))
      .order(ByteOrder.LITTLE_ENDIAN)
    dtype match {
      case "uint8" | "int8" => data.foreach(v => bb.put(v.toByte))
      case "uint16" | "int16" => data.foreach(v => bb.putShort(v.toInt.toShort))
      case "uint32" | "int32" => data.foreach(v => bb.putInt(v.toLong.toInt))
      case "int64" | "uint64" => data.foreach(v => bb.putLong(
        if (v.isNaN) 0L else if (v >= Long.MaxValue.toDouble) Long.MaxValue else v.toLong))
      case "float32" => data.foreach(v => bb.putFloat(v.toFloat))
      case _ => data.foreach(bb.putDouble)
    }
    val tmp = Files.createTempFile(dir, column, ".tmp")
    val out = new com.github.luben.zstd.ZstdOutputStream(
      Files.newOutputStream(tmp), 1)
    out.write(bb.array())
    out.close()
    Files.move(tmp, dir.resolve(s"$column.bin"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readRegion(tileRef: String, column: String, dtype: String): Array[Double] = {
    val f = Paths.get(path, s"tile=$tileRef", s"$column.bin")
    val raw = Files.newInputStream(f)
    val buf = new java.io.BufferedInputStream(raw)
    // Frame sniff: Zstd magic 28 B5 2F FD; anything else is a round-1
    // DEFLATE region.
    buf.mark(4)
    val m = new Array[Byte](4)
    val read = buf.readNBytes(m, 0, 4)
    buf.reset()
    val isZstd = read == 4 && m(0) == 0x28.toByte && m(1) == 0xB5.toByte &&
      m(2) == 0x2F.toByte && m(3) == 0xFD.toByte
    val in =
      if (isZstd) new com.github.luben.zstd.ZstdInputStream(buf)
      else new java.util.zip.InflaterInputStream(buf)
    val bytes = in.readAllBytes()
    in.close()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bytes.length / bytesPer(dtype)
    val out = new Array[Double](n)
    var i = 0
    dtype match {
      case "uint8" => while (i < n) { out(i) = bb.get() & 0xff; i += 1 }
      case "int8" => while (i < n) { out(i) = bb.get().toDouble; i += 1 }
      case "uint16" => while (i < n) { out(i) = bb.getShort() & 0xffff; i += 1 }
      case "int16" => while (i < n) { out(i) = bb.getShort().toDouble; i += 1 }
      case "uint32" => while (i < n) { out(i) = bb.getInt().toLong & 0xffffffffL; i += 1 }
      case "int32" => while (i < n) { out(i) = bb.getInt().toDouble; i += 1 }
      case "int64" | "uint64" => while (i < n) { out(i) = bb.getLong().toDouble; i += 1 }
      case "float32" => while (i < n) { out(i) = bb.getFloat().toDouble; i += 1 }
      case _ => while (i < n) { out(i) = bb.getDouble(); i += 1 }
    }
    out
  }

  /** Written tile refs (for resume diffing + canvas assembly). */
  def tiles(): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(p).iterator().asScala.toSeq
        .map(_.getFileName.toString)
        .filter(_.startsWith("tile="))
        .map(_.stripPrefix("tile="))
        .sorted
    }
  }

  /** Tiles whose every listed column region is already written — the
    * resume set (tile writes are atomic + idempotent, so anything not
    * complete is simply redone).
    */
  def completeTiles(columns: Seq[String]): Seq[String] =
    tiles().filter { ref =>
      columns.forall(c =>
        Files.exists(Paths.get(path, s"tile=$ref", s"$c.bin")))
    }

  /** Assemble the full canvas for a column — nodata-filled where tiles
    * were never written (the skeleton semantics). Test/analysis helper;
    * row 0 = canvas top.
    */
  def assembleCanvas(column: String): Array[Array[Double]] = {
    val h = header
    val spec = h.columns.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(s"no column $column"))
    val w = math.round((h.canvasMaxX - h.canvasMinX) / h.cellSize).toInt
    val ht = math.round((h.canvasMaxY - h.canvasMinY) / h.cellSize).toInt
    val canvas = Array.fill(ht, w)(spec.nodata)
    val tilesPerEdge = math.round(h.tileSize / h.cellSize).toInt
    tiles().foreach { ref =>
      val (minx, miny, maxx, maxy) = graft.index.Bng.bounds(ref)
      val (r0, _, c0, _) = Rasterize.regionSlice(minx, miny, maxx, maxy,
        h.canvasMaxY, h.cellSize)
      val data = readRegion(ref, column, spec.dtype)
      var r = 0
      while (r < tilesPerEdge) {
        var c = 0
        while (c < tilesPerEdge) {
          val rr = r0 + r; val cc = c0 + c
          if (rr >= 0 && rr < ht && cc >= 0 && cc < w)
            canvas(rr)(cc) = data(r * tilesPerEdge + c)
          c += 1
        }
        r += 1
      }
    }
    canvas
  }
}
