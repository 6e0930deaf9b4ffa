package graft

import graft.geo.GeoExpressions._
import graft.geo.Wkb
import graft.ops.{KnnJoin, SpatialJoin}
import graft.input.WebTable
import org.apache.spark.sql.functions._

/** Spatial join / kNN against brute-force JTS oracles on seeded random
  * data (SURVEY.md §5 mapping (f): PIP vs JTS oracle).
  */
class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(i: Long, salt: Long): Double =
    java.lang.Long.remainderUnsigned(WebTable.splitmix64(i * 1000003L + salt), 1000000L) / 1000000.0

  private lazy val pts = (0L until 2000L).map { i =>
    (i, rnd(i, 1) * 700000.0, rnd(i, 2) * 1300000.0)
  }
  // Irregular triangles, not axis-aligned boxes — exercises the JTS refine.
  private lazy val tris = (0L until 30L).map { j =>
    val cx = rnd(j, 3) * 650000.0
    val cy = rnd(j, 4) * 1250000.0
    val r1 = 5000.0 + rnd(j, 5) * 60000.0
    val wkt = s"POLYGON (($cx ${cy + r1}, ${cx - r1} ${cy - r1 / 2}, " +
      s"${cx + r1 * 0.8} ${cy - r1}, $cx ${cy + r1}))"
    (j, wkt)
  }

  test("cell-indexed point-in-polygon join matches brute-force JTS oracle") {
    val ptsDf = pts.toDF("pid", "x", "y")
    val polyDf = tris.toDF("poly_id", "wkt")
      .withColumn("geometry", st_geomfromtext(col("wkt"))).drop("wkt")

    val got = SpatialJoin.pointInPolygon(ptsDf, "x", "y", polyDf, "geometry",
        resolution = 10000L, broadcastPolys = true, predicate = "covers")
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet

    val polys = tris.map { case (j, wkt) => j -> Wkb.readWkt(wkt) }
    val expected = (for {
      (pid, x, y) <- pts
      (jid, g) <- polys
      if g.covers(Wkb.point(x, y))
    } yield (pid, jid)).toSet

    assert(expected.nonEmpty, "oracle produced no pairs — fixture broken")
    assert(got == expected)
  }

  test("geomJoin polygons x polygons intersects matches oracle incl. multi-cell dedupe") {
    val a = tris.take(15).toDF("a_id", "wkt")
      .withColumn("ga", st_geomfromtext(col("wkt"))).drop("wkt")
    val b = tris.drop(15).toDF("b_id", "wkt")
      .withColumn("gb", st_geomfromtext(col("wkt"))).drop("wkt")
    val got = SpatialJoin.geomJoin(a, "ga", "a_id", b, "gb", "b_id",
        resolution = 100000L, predicate = "intersects", broadcastRight = true)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "dedupe failed: duplicate pairs")
    val polys = tris.map { case (j, wkt) => j -> Wkb.readWkt(wkt) }.toMap
    val expected = (for {
      (aid, _) <- tris.take(15)
      (bid, _) <- tris.drop(15)
      if polys(aid).intersects(polys(bid))
    } yield (aid, bid)).toSet
    assert(got.toSet == expected)
  }

  test("non-broadcast (sort-merge) spatial join path matches broadcast path") {
    val ptsDf = pts.toDF("pid", "x", "y")
    val polyDf = tris.toDF("poly_id", "wkt")
      .withColumn("geometry", st_geomfromtext(col("wkt"))).drop("wkt")
    val viaBroadcast = SpatialJoin.pointInPolygon(ptsDf, "x", "y", polyDf, "geometry",
        resolution = 10000L, broadcastPolys = true, predicate = "covers")
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    val viaShuffle = SpatialJoin.pointInPolygon(ptsDf, "x", "y", polyDf, "geometry",
        resolution = 10000L, broadcastPolys = false, predicate = "covers")
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    assert(viaShuffle == viaBroadcast)
  }

  test("H3- and S2-keyed spatial joins return the same pairs as the BNG join") {
    val ptsDf = pts.toDF("pid", "x", "y")
    val polyDf = tris.toDF("poly_id", "wkt")
      .withColumn("geometry", st_geomfromtext(col("wkt"))).drop("wkt")
    val viaBng = SpatialJoin.pointInPolygon(ptsDf, "x", "y", polyDf, "geometry",
        resolution = 10000L, predicate = "covers")
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    val viaS2 = SpatialJoin.pointInPolygonSpherical(ptsDf, "x", "y",
        polyDf, "geometry", system = "s2", res = 11)
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    val viaH3 = SpatialJoin.pointInPolygonSpherical(ptsDf, "x", "y",
        polyDf, "geometry", system = "h3", res = 7)
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    assert(viaS2 == viaBng)
    assert(viaH3 == viaBng)
  }

  test("spatial join result invariant under input partitioning (north rule)") {
    val polyDf = tris.toDF("poly_id", "wkt")
      .withColumn("geometry", st_geomfromtext(col("wkt"))).drop("wkt")
    def run(parts: Int) = SpatialJoin.pointInPolygon(
        pts.toDF("pid", "x", "y").repartition(parts), "x", "y",
        polyDf, "geometry", resolution = 10000L)
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    assert(run(1) == run(13))
  }

  test("adaptive-radius kNN equals broadcast brute-force kNN") {
    val qs = (0L until 25L).map { q =>
      (q, rnd(q, 17) * 700000.0, rnd(q, 18) * 1300000.0)
    }.toDF("qid", "qx", "qy")
    val data = pts.toDF("did", "x", "y")
    val adaptive = KnnJoin.knnAdaptive(qs, "qid", "qx", "qy", data, "did", "x", "y",
      k = 7, resolution = 10000L) // sparse cells => fallback path exercised
      .select("qid", "did", "rank").as[(Long, Long, Int)].collect().toSet
    val bruteForce = KnnJoin.knnBroadcast(qs, "qid", "qx", "qy", data, "did", "x", "y", k = 7)
      .select("qid", "did", "rank").as[(Long, Long, Int)].collect().toSet
    assert(adaptive.size == 25 * 7)
    assert(adaptive == bruteForce)
  }

  test("ring-expansion kNN equals broadcast brute-force kNN") {
    val qs = (0L until 25L).map { q =>
      (q, rnd(q, 7) * 700000.0, rnd(q, 8) * 1300000.0)
    }.toDF("qid", "qx", "qy")
    val data = pts.toDF("did", "x", "y")
    val viaRings = KnnJoin.knn(qs, "qid", "qx", "qy", data, "did", "x", "y",
      k = 7, resolution = 100000L)
      .select("qid", "did", "rank").as[(Long, Long, Int)].collect().toSet
    val bruteForce = KnnJoin.knnBroadcast(qs, "qid", "qx", "qy", data, "did", "x", "y", k = 7)
      .select("qid", "did", "rank").as[(Long, Long, Int)].collect().toSet
    assert(viaRings.size == 25 * 7)
    assert(viaRings == bruteForce)
  }
}
