package graft.raster

import org.locationtech.jts.geom.{Geometry, LineString, Polygon}

/** In-memory tile raster: `cells x cells` doubles in row-major order with
  * row 0 at the tile's TOP (max northing), matching the reference's
  * north-up canvas (`_dataframe.py:536-539`: dims ("northings","eastings"),
  * y descending).
  */
final case class TileGrid(
    minx: Double, miny: Double, cellSize: Double, cells: Int,
    data: Array[Double]) {
  def maxy: Double = miny + cells * cellSize
  def idx(row: Int, col: Int): Int = row * cells + col
  /** Column of an x coordinate; -1 if outside. */
  def colOf(x: Double): Int = {
    val c = math.floor((x - minx) / cellSize).toInt
    if (c < 0 || c >= cells) -1 else c
  }
  /** Row of a y coordinate (row 0 = top); -1 if outside. Cells are
    * half-open [y0, y0 + cellSize) so the tile's min edge is inside and
    * its max edge belongs to the next tile.
    */
  def rowOf(y: Double): Int = {
    val up = math.floor((y - miny) / cellSize).toInt
    if (up < 0 || up >= cells) -1 else cells - 1 - up
  }
}

/** Scanline rasterization — the JVM rebuild of the reference's rasterio
  * `features.rasterize` / `geometry_mask` kernels
  * (`_dataframe.py:624-654`, `_vector.py:198-308`).
  *
  * Semantics pinned to rasterio defaults so the reference's golden arrays
  * reproduce:
  *  - a cell is burned iff its CENTER is inside the polygon
  *    (center-sampling, GDAL all_touched=False);
  *  - burn order = input order, LAST write wins on overlap;
  *  - empty geometries / empty tiles short-circuit
  *    (`_vector.py:218-227, 279-285`).
  */
object Rasterize {

  def empty(minx: Double, miny: Double, cellSize: Double, cells: Int,
      fill: Double): TileGrid = {
    val data = new Array[Double](cells * cells)
    java.util.Arrays.fill(data, fill)
    TileGrid(minx, miny, cellSize, cells, data)
  }

  /** Burn a point's cell (points: center-sampling degenerates to "the cell
    * containing the point"; boundary points on the max edge belong to the
    * next cell and so fall outside this tile — half-open cells).
    */
  def burnPoint(grid: TileGrid, x: Double, y: Double, value: Double): Boolean = {
    val c = grid.colOf(x)
    val r = grid.rowOf(y)
    if (c < 0 || r < 0) false
    else { grid.data(grid.idx(r, c)) = value; true }
  }

  /** Burn any JTS geometry with `value`. Polygons (incl. holes) use
    * even-odd scanline at cell centers; lines/points burn the cells whose
    * center-row they cross / containing cell.
    */
  def burnGeometry(grid: TileGrid, geom: Geometry, value: Double): Unit = {
    if (geom == null || geom.isEmpty) return
    geom match {
      case p: Polygon => burnPolygon(grid, p, value)
      case l: LineString => burnLine(grid, l, value)
      case pt: org.locationtech.jts.geom.Point => burnPoint(grid, pt.getX, pt.getY, value)
      case coll: org.locationtech.jts.geom.GeometryCollection =>
        var i = 0
        while (i < coll.getNumGeometries) {
          burnGeometry(grid, coll.getGeometryN(i), value); i += 1
        }
      case other => burnPolygon(grid, other.convexHull().asInstanceOf[Polygon], value)
    }
  }

  /** Even-odd scanline fill at cell centers (rasterio/GDAL semantics). */
  private def burnPolygon(grid: TileGrid, poly: Polygon, value: Double): Unit = {
    val env = poly.getEnvelopeInternal
    // Candidate row range: rows whose center-y lies within the envelope.
    val rLo = math.max(0, math.floor((grid.maxy - env.getMaxY) / grid.cellSize - 0.5).toInt)
    val rHi = math.min(grid.cells - 1, math.ceil((grid.maxy - env.getMinY) / grid.cellSize - 0.5).toInt)
    // Collect all rings: shell + holes (even-odd rule handles both uniformly).
    val rings = new scala.collection.mutable.ArrayBuffer[Array[org.locationtech.jts.geom.Coordinate]]()
    rings += poly.getExteriorRing.getCoordinates
    var h = 0
    while (h < poly.getNumInteriorRing) {
      rings += poly.getInteriorRingN(h).getCoordinates; h += 1
    }
    var r = rLo
    val xs = new scala.collection.mutable.ArrayBuffer[Double]()
    while (r <= rHi) {
      val cy = grid.maxy - (r + 0.5) * grid.cellSize
      xs.clear()
      // Gather x-intersections of the scanline y=cy with every ring edge.
      var ri = 0
      while (ri < rings.length) {
        val cs = rings(ri)
        var i = 0
        while (i < cs.length - 1) {
          val y1 = cs(i).y; val y2 = cs(i + 1).y
          // Half-open edge rule [min, max) avoids double-counting vertices.
          if ((y1 <= cy && cy < y2) || (y2 <= cy && cy < y1)) {
            val t = (cy - y1) / (y2 - y1)
            xs += cs(i).x + t * (cs(i + 1).x - cs(i).x)
          }
          i += 1
        }
        ri += 1
      }
      if (xs.nonEmpty) {
        val sorted = xs.toArray
        java.util.Arrays.sort(sorted)
        var k = 0
        while (k + 1 < sorted.length) {
          val x0 = sorted(k); val x1 = sorted(k + 1)
          // Cells whose center-x lies in [x0, x1).
          val cLo = math.max(0, math.ceil((x0 - grid.minx) / grid.cellSize - 0.5).toInt)
          val cHi = math.min(grid.cells - 1, math.ceil((x1 - grid.minx) / grid.cellSize - 0.5).toInt - 1)
          var c = cLo
          while (c <= cHi) {
            grid.data(grid.idx(r, c)) = value
            c += 1
          }
          k += 2
        }
      }
      r += 1
    }
  }

  /** Rasterize a line: burn every cell whose interior the line passes
    * through (simple dense sampling at sub-cell steps — lines are rare in
    * this workload; exactness is pinned by tests only for polygons/points).
    */
  private def burnLine(grid: TileGrid, line: LineString, value: Double): Unit = {
    val cs = line.getCoordinates
    var i = 0
    while (i < cs.length - 1) {
      val x1 = cs(i).x; val y1 = cs(i).y
      val x2 = cs(i + 1).x; val y2 = cs(i + 1).y
      val len = math.hypot(x2 - x1, y2 - y1)
      val steps = math.max(1, math.ceil(len / (grid.cellSize * 0.5)).toInt)
      var s = 0
      while (s <= steps) {
        val t = s.toDouble / steps
        burnPoint(grid, x1 + t * (x2 - x1), y1 + t * (y2 - y1), value)
        s += 1
      }
      i += 1
    }
  }

  /** Order-aware write decision, shared by every ordered-burn site (the
    * geometry burn, the point burn, and the cross-partial merge): the
    * winning row per cell is the LEXICOGRAPHIC MAX of (ord, value). With
    * unique order values this is exactly sequential last-write-wins; with
    * duplicated orders the value tie-break keeps the result deterministic
    * at ANY partitioning (a bare >= or > would let the nondeterministic
    * task/iterator order pick the winner). `ord` must be > Long.MinValue
    * (the empty-cell sentinel).
    */
  @inline def ordWins(ord: Long, value: Double, curOrd: Long, curValue: Double): Boolean =
    ord > curOrd || (ord == curOrd && value > curValue)

  /** Order-aware burn for salted/parallel partial grids: merging partial
    * grids by per-cell (ord, value) max reproduces the exact sequential
    * last-write-wins result regardless of how rows were split across
    * salted tasks (see [[ordWins]] for the duplicate-order tie-break).
    */
  def burnGeometryOrdered(grid: TileGrid, ordGrid: Array[Long],
      geom: Geometry, value: Double, ord: Long): Unit = {
    if (geom == null || geom.isEmpty) return
    // two-pass: mark covered cells in a scratch grid with the standard
    // scanline, then apply order-checked writes cell-by-cell
    val marker = empty(grid.minx, grid.miny, grid.cellSize, grid.cells, 0d)
    burnGeometry(marker, geom, 1d)
    var i = 0
    while (i < marker.data.length) {
      if (marker.data(i) == 1d && ordWins(ord, value, ordGrid(i), grid.data(i))) {
        ordGrid(i) = ord
        grid.data(i) = value
      }
      i += 1
    }
  }

  /** Region placement math — the reference's `_dataframe.py:662-672`:
    * global-canvas row/col slice of a tile given the full-canvas extent.
    * Returns (rowStart, rowEnd, colStart, colEnd), rows from the TOP of
    * the canvas, end-exclusive.
    */
  def regionSlice(tileMinx: Double, tileMiny: Double, tileMaxx: Double,
      tileMaxy: Double, canvasMaxy: Double, cellSize: Double)
      : (Int, Int, Int, Int) = {
    val rowStart = math.round((canvasMaxy - tileMaxy) / cellSize).toInt
    val rowEnd = math.round((canvasMaxy - tileMiny) / cellSize).toInt
    val colStart = math.round(tileMinx / cellSize).toInt
    val colEnd = math.round(tileMaxx / cellSize).toInt
    (rowStart, rowEnd, colStart, colEnd)
  }
}
