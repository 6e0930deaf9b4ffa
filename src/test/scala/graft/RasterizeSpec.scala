package graft

import graft.geo.Wkb
import graft.raster.Rasterize
import org.scalatest.funsuite.AnyFunSuite

class RasterizeSpec extends AnyFunSuite {

  test("center-sampling polygon burn (rasterio semantics)") {
    // 10x10 grid, cell 1. Box [2.0, 2.0, 5.0, 5.0]: cells whose CENTER is
    // inside => centers 2.5, 3.5, 4.5 in both axes => 3x3 cells.
    val g = Rasterize.empty(0, 0, 1, 10, fill = 0)
    Rasterize.burnGeometry(g, Wkb.box(2, 2, 5, 5), 1)
    val burned = g.data.count(_ == 1d)
    assert(burned == 9, s"expected 9 burned cells, got $burned")
    // row 0 is top (y in [9,10)) — box rows are 10-5=5..10-2=8 exclusive
    assert(g.data(g.idx(5, 2)) == 1d)
    assert(g.data(g.idx(7, 4)) == 1d)
    assert(g.data(g.idx(4, 2)) == 0d)
    assert(g.data(g.idx(5, 5)) == 0d)
  }

  test("box covering exact cell boundaries burns exactly its cells") {
    // Reference to_zarr chequerboard analogue: a 100km box at mocked
    // cell_size 100_000 / out_shape (1,1) burns exactly one cell.
    val g = Rasterize.empty(0, 0, 100000, 7, fill = 255)
    Rasterize.burnGeometry(g, Wkb.box(200000, 0, 300000, 100000), 3)
    assert(g.data.count(_ == 3d) == 1)
    assert(g.data(g.idx(6, 2)) == 3d) // bottom row (y=0..100k), col 2
  }

  test("polygon with hole honours even-odd rule") {
    val shell = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 3))"
    val g = Rasterize.empty(0, 0, 1, 10, fill = 0)
    Rasterize.burnGeometry(g, Wkb.readWkt(shell), 1)
    // center (5.5, 3.5) inside triangle hole => unburned
    assert(g.data(g.idx(g.rowOf(3.5), g.colOf(5.5))) == 0d)
    assert(g.data(g.idx(g.rowOf(1.5), g.colOf(5.5))) == 1d)
  }

  test("last write wins on overlap") {
    val g = Rasterize.empty(0, 0, 1, 4, fill = -1)
    Rasterize.burnGeometry(g, Wkb.box(0, 0, 4, 4), 1)
    Rasterize.burnGeometry(g, Wkb.box(1, 1, 3, 3), 2)
    assert(g.data(g.idx(g.rowOf(1.5), g.colOf(1.5))) == 2d)
    assert(g.data(g.idx(g.rowOf(0.5), g.colOf(0.5))) == 1d)
  }

  test("point burn half-open cells + out-of-tile rejected") {
    val g = Rasterize.empty(0, 0, 10, 10, fill = 0)
    assert(Rasterize.burnPoint(g, 0, 0, 5))
    assert(Rasterize.burnPoint(g, 99.999, 99.999, 6))
    assert(!Rasterize.burnPoint(g, 100, 50, 7)) // max edge belongs to next tile
    assert(!Rasterize.burnPoint(g, -0.1, 50, 7))
    assert(g.data(g.idx(9, 0)) == 5d)
    assert(g.data(g.idx(0, 9)) == 6d)
  }

  test("region slice math matches reference _dataframe.py:662-672") {
    // Tile SE (400k..500k easting, 400k..500k northing) on the full BNG
    // canvas at 10m cells: rows (1300000-500000)/10 .. (1300000-400000)/10.
    val (r0, r1, c0, c1) = Rasterize.regionSlice(400000, 400000, 500000, 500000,
      canvasMaxy = 1300000, cellSize = 10)
    assert((r0, r1, c0, c1) == (80000, 90000, 40000, 50000))
  }

  test("empty geometry fast path") {
    val g = Rasterize.empty(0, 0, 1, 4, fill = 9)
    Rasterize.burnGeometry(g, Wkb.readWkt("POLYGON EMPTY"), 1)
    assert(g.data.forall(_ == 9d))
  }
}
