package graft

import graft.multimodal.{Bmp, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** From-scratch BMP codec: encode/decode roundtrip across every padding
  * width, top-down (negative height) layout, loud rejection of
  * unsupported inputs, and checksum sensitivity to pixel position.
  */
class BmpSpec extends SparkSpec {

  private def expectedChecksum(seed: Long, w: Int, h: Int): Long =
    (0 until w * h).map { p =>
      val r = (seed + 3L * p) % 256
      val g = (seed + 3L * p + 1) % 256
      val b = (seed + 3L * p + 2) % 256
      (r + 2 * g + 3 * b) * (p + 1L)
    }.sum

  test("decode(synth) roundtrip across all padding widths") {
    // 3*w mod 4 cycles 0,3,2,1 over w=8..11 — all four padding cases
    for (w <- 8 to 11; h <- Seq(1, 6, 7); seed <- Seq(0L, 17L, 255L, 1000L)) {
      val img = Bmp.decode(Bmp.synth(seed, w, h))
      assert(img.width == w && img.height == h)
      assert(Bmp.checksum(img) == expectedChecksum(seed, w, h),
        s"checksum mismatch at seed=$seed w=$w h=$h")
      // spot-check a raw pixel: top-left is p=0
      assert((img.rgb(0) & 0xff) == (seed % 256).toInt)
    }
  }

  test("top-down (negative height) BMPs decode to the same pixels") {
    val seed = 42L; val w = 9; val h = 5
    val bottomUp = Bmp.synth(seed, w, h)
    // rewrite as top-down: negate height, reverse row order
    val rs = (w * 3 + 3) / 4 * 4
    val topDown = bottomUp.clone()
    val negH = -h
    topDown(22) = negH.toByte; topDown(23) = (negH >> 8).toByte
    topDown(24) = (negH >> 16).toByte; topDown(25) = (negH >> 24).toByte
    for (y <- 0 until h; i <- 0 until rs)
      topDown(54 + y * rs + i) = bottomUp(54 + (h - 1 - y) * rs + i)
    val a = Bmp.decode(bottomUp)
    val b = Bmp.decode(topDown)
    assert(a.rgb.toSeq == b.rgb.toSeq)
  }

  test("unsupported inputs fail loudly, never decode wrong") {
    val good = Bmp.synth(1L, 8, 4)
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Bmp.decode(badMagic))
    intercept[IllegalArgumentException](Bmp.decode(good.take(40)))
    val bad8bpp = good.clone(); bad8bpp(28) = 8
    intercept[IllegalArgumentException](Bmp.decode(bad8bpp))
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Bmp.decode(rle))
    val truncated = good.take(good.length - 4)
    intercept[IllegalArgumentException](Bmp.decode(truncated))
  }

  test("checksum is position-sensitive (swap two pixels => different value)") {
    val img = Bmp.decode(Bmp.synth(7L, 8, 4))
    val swapped = img.rgb.clone()
    for (i <- 0 until 3) {
      val t = swapped(i); swapped(i) = swapped(3 + i); swapped(3 + i) = t
    }
    assert(Bmp.checksum(img) != Bmp.checksum(Bmp.Image(img.width, img.height, swapped)))
  }

  test("decodeBmpMeta runs the real decoder through the batched plumbing") {
    import spark.implicits._
    val df = (0L until 50L).toDF("id")
      .withColumn("payload", udf { (id: Long) =>
        Bmp.synth(id, (8 + id % 9).toInt, (6 + id % 7).toInt)
      }.apply(col("id")))
    val got = Multimodal.decodeBmpMeta(df, "id", "payload").collect()
    assert(got.length == 50)
    got.foreach { m =>
      val w = (8 + m.id % 9).toInt; val h = (6 + m.id % 7).toInt
      assert(m.width == w && m.height == h && m.n_px == w.toLong * h)
      assert(m.px_checksum == expectedChecksum(m.id, w, h))
    }
  }
}
