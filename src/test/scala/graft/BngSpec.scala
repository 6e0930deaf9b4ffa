package graft

import graft.core.Constants
import graft.index.Bng
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class BngSpec extends AnyFunSuite {

  def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("known 100km letter pairs") {
    assert(Bng.gridRef(432674, 432342, 100000) == "SE")
    assert(Bng.gridRef(530000, 180000, 100000) == "TQ")
    assert(Bng.gridRef(0, 1200000, 100000) == "HL") // reference to_zarr.py:85 NW corner
    assert(Bng.gridRef(0, 0, 100000) == "SV")
    assert(Bng.gridRef(650000, 0, 100000) == "TW")
  }

  test("10km and 1km digit refs") {
    assert(Bng.gridRef(432674, 432342, 10000) == "SE33")
    assert(Bng.gridRef(432674, 432342, 1000) == "SE3232")
    assert(Bng.gridRef(5000, 5000, 10000) == "SV00")
  }

  test("round-trip: parse(gridRef(e, n)) floors to cell origin") {
    val coord = for {
      e <- Gen.choose(0L, Constants.BngXMax - 1)
      n <- Gen.choose(0L, Constants.BngYMax - 1)
      r <- Gen.oneOf(Bng.Resolutions)
    } yield (e, n, r)
    check(Prop.forAll(coord) { case (e, n, r) =>
      val ref = Bng.gridRef(e.toDouble, n.toDouble, r)
      val (pe, pn, pr) = Bng.parse(ref)
      pr == r && pe == (e / r) * r && pn == (n / r) * r
    })
  }

  test("bounds match parse") {
    val (minx, miny, maxx, maxy) = Bng.bounds("SE33")
    assert((minx, miny, maxx, maxy) == (430000d, 430000d, 440000d, 440000d))
  }

  test("envelopeCells covers exactly the intersecting cells") {
    val cells = Bng.envelopeCells(395000, 395000, 415000, 405000, 10000)
    // x cells: 39,40,41; y cells: 39,40 -> 6 cells
    assert(cells.size == 6)
    val expected = for {
      ny <- Seq(39L, 40L)
      ex <- Seq(39L, 40L, 41L)
    } yield Bng.gridRef(ex * 10000d, ny * 10000d, 10000)
    assert(cells.toSet == expected.toSet)
  }

  test("envelope clamps to canvas") {
    val cells = Bng.envelopeCells(-50000, -50000, 5000, 5000, 10000)
    assert(cells == Seq("SV00"))
  }

  test("cellId is unique per cell and stable") {
    val id1 = Bng.cellId(432674, 432342, 10000)
    val id2 = Bng.cellId(439999, 439999, 10000)
    val id3 = Bng.cellId(440001, 432342, 10000)
    assert(id1 == id2)
    assert(id1 != id3)
  }
}
