package graft

import graft.ops.{KnnJoin, SpatialJoin}
import graft.text.TextExtract
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Edge cases and fuzzing across the engine surface. */
class HardeningSpec extends SparkSpec {
  import spark.implicits._

  def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("extractText never throws and is deterministic on adversarial input") {
    val soup = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('<', '>', '&', ';', '#', '/', ' ', '\n', '\t'),
      1 -> Gen.oneOf("script", "style", "amp", "lt", "#65", "nbsp")
        .flatMap(s => Gen.const(s.head)) // fragments of magic tokens
    )).map(_.mkString)
    check(Prop.forAll(soup) { s =>
      val a = TextExtract.extractText(s)
      val b = TextExtract.extractText(s)
      a == b && !a.exists(c => c == '\n' || c == '\t') &&
        !a.startsWith(" ") && !a.endsWith(" ")
    })
    // pathological: unterminated tag, unterminated script, entity at end
    assert(TextExtract.extractText("<p>a<unclosed") == "a")
    assert(TextExtract.extractText("<script>never ends") == "")
    assert(TextExtract.extractText("x &am") == "x &am")
    assert(TextExtract.extractText("&#99999999;").nonEmpty == false ||
      TextExtract.extractText("&#99999999;").nonEmpty) // no throw is the assertion
  }

  test("kNN with k greater than the corpus returns the whole corpus ranked") {
    val qs = Seq((1L, 100000.0, 100000.0)).toDF("qid", "qx", "qy")
    val data = Seq((10L, 100.0, 100.0), (11L, 699999.0, 1299999.0),
      (12L, 350000.0, 650000.0)).toDF("did", "x", "y")
    val got = KnnJoin.knnAdaptive(qs, "qid", "qx", "qy", data, "did", "x", "y",
      k = 10, resolution = 100000L)
      .select("did").as[Long].collect().toSet
    assert(got == Set(10L, 11L, 12L))
  }

  test("kNN with empty corpus returns empty") {
    val qs = Seq((1L, 100000.0, 100000.0)).toDF("qid", "qx", "qy")
    val data = Seq.empty[(Long, Double, Double)].toDF("did", "x", "y")
    assert(KnnJoin.knnAdaptive(qs, "qid", "qx", "qy", data, "did", "x", "y",
      k = 3, resolution = 100000L).count() == 0)
  }

  test("radiusJoin matches brute force on seeded data") {
    def rnd(i: Long, salt: Long): Double =
      java.lang.Long.remainderUnsigned(
        graft.input.WebTable.splitmix64(i * 7919L + salt), 1000000L) / 1000000.0
    val pts = (0L until 1500L).map(i => (i, rnd(i, 1) * 700000.0, rnd(i, 2) * 1300000.0))
    val qs = (0L until 20L).map(i => (i, rnd(i, 3) * 700000.0, rnd(i, 4) * 1300000.0))
    val radius = 55000.0
    val got = SpatialJoin.radiusJoin(
        qs.toDF("qid", "qx", "qy"), "qid", "qx", "qy",
        pts.toDF("pid", "x", "y"), "pid", "x", "y",
        radius, resolution = 10000L)
      .select("qid", "pid").as[(Long, Long)].collect().toSet
    val expected = (for {
      (qid, qx, qy) <- qs
      (pid, x, y) <- pts
      if (x - qx) * (x - qx) + (y - qy) * (y - qy) <= radius * radius
    } yield (qid, pid)).toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("spatial join with empty polygon side returns empty, not error") {
    val pts = Seq((1L, 100.0, 100.0)).toDF("pid", "x", "y")
    val polys = Seq.empty[(Long, Array[Byte])].toDF("poly_id", "geometry")
    assert(SpatialJoin.pointInPolygon(pts, "x", "y", polys, "geometry").count() == 0)
  }
}
