package graft

import graft.multimodal.{Multimodal, Png}
import org.apache.spark.sql.functions._

/** From-scratch PNG codec: filter-complete roundtrip (synth cycles all
  * five filter types per image), RGB and RGBA, multi-IDAT concatenation,
  * CRC verification, loud rejection of interlace / palette / 16-bit /
  * corrupt streams, and an independent fixed-vector decode (an image NOT
  * produced by our own encoder) so encoder and decoder can't share a bug.
  */
class PngSpec extends SparkSpec {

  private def expectedChecksum(seed: Long, w: Int, h: Int, ch: Int): Long =
    (0 until w * h).map { p =>
      val px = (0 until ch).map(c => (c + 1L) * ((seed + ch.toLong * p + c) % 256)).sum
      px * (p + 1L)
    }.sum

  test("decode(synth) roundtrip exercises all five filters, RGB and RGBA") {
    // h >= 5 => rows carry filters 0,1,2,3,4 (synth uses filter y % 5)
    for (ch <- Seq(3, 4); w <- Seq(1, 5, 12); h <- Seq(5, 6, 11);
         seed <- Seq(0L, 17L, 255L, 999L)) {
      val img = Png.decode(Png.synth(seed, w, h, ch))
      assert(img.width == w && img.height == h && img.channels == ch)
      assert(Png.checksum(img) == expectedChecksum(seed, w, h, ch),
        s"checksum mismatch at seed=$seed w=$w h=$h ch=$ch")
      // spot-check raw pixels: top-left R, and last pixel's last channel
      assert((img.pixels(0) & 0xff) == (seed % 256).toInt)
      val lastIdx = w * h * ch - 1
      assert((img.pixels(lastIdx) & 0xff) ==
        ((seed + lastIdx) % 256).toInt)
    }
  }

  test("decoder handles an image not produced by our encoder (independent vector)") {
    // 2x2 RGB, all rows filter 0, pixels hand-laid: rows (10,20,30)(40,50,60)
    // and (70,80,90)(100,110,120); zlib stream via Deflater directly (the
    // encoder path under test is ONLY the decoder here).
    val raw: Array[Byte] = Array[Int](
      0, 10, 20, 30, 40, 50, 60,
      0, 70, 80, 90, 100, 110, 120).map(_.toByte)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zbuf = new Array[Byte](64)
    val zlen = d.deflate(zbuf); d.end()
    val z = java.util.Arrays.copyOf(zbuf, zlen)
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val td = typ.getBytes("US-ASCII") ++ data
      be32(data.length) ++ td ++ be32(Png.crc32(td, 0, td.length))
    }
    val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0)
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", z) ++ chunk("IEND", Array.empty[Byte])
    val img = Png.decode(png)
    assert(img.width == 2 && img.height == 2 && img.channels == 3)
    assert(img.pixels.map(_ & 0xff).toSeq ==
      Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
  }

  test("unsupported and corrupt inputs fail loudly, never decode wrong") {
    val good = Png.synth(1L, 6, 6, 3)
    // bad signature
    val badSig = good.clone(); badSig(0) = 'X'
    intercept[IllegalArgumentException](Png.decode(badSig))
    // flipped IHDR byte => CRC mismatch (byte 16+8 = bit depth field lives
    // in the IHDR data, covered by its CRC)
    val badCrc = good.clone(); badCrc(24) = (badCrc(24) ^ 0x01).toByte
    intercept[IllegalArgumentException](Png.decode(badCrc))
    // Adam7 interlace: rewrite interlace byte AND fix the CRC so the
    // rejection tested is the interlace gate, not the CRC
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1 // IHDR data byte 12 (interlace method)
    val fixed = Png.crc32(interlaced, 12, 12 + 4 + 13)
    interlaced(12 + 4 + 13) = (fixed >>> 24).toByte
    interlaced(12 + 4 + 13 + 1) = (fixed >>> 16).toByte
    interlaced(12 + 4 + 13 + 2) = (fixed >>> 8).toByte
    interlaced(12 + 4 + 13 + 3) = fixed.toByte
    val e = intercept[IllegalArgumentException](Png.decode(interlaced))
    assert(e.getMessage.contains("interlace"))
    // palette color type (3), CRC-fixed the same way
    val palette = good.clone()
    palette(8 + 8 + 9) = 3
    val pf = Png.crc32(palette, 12, 12 + 4 + 13)
    palette(12 + 4 + 13) = (pf >>> 24).toByte
    palette(12 + 4 + 13 + 1) = (pf >>> 16).toByte
    palette(12 + 4 + 13 + 2) = (pf >>> 8).toByte
    palette(12 + 4 + 13 + 3) = pf.toByte
    intercept[IllegalArgumentException](Png.decode(palette))
    // truncated pixel stream
    intercept[IllegalArgumentException](Png.decode(good.take(good.length - 20)))
    // garbage DEFLATE payload inside a CRC-valid IDAT
    intercept[IllegalArgumentException] {
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
        val td = typ.getBytes("US-ASCII") ++ data
        be32(data.length) ++ td ++ be32(Png.crc32(td, 0, td.length))
      }
      val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0)
      val junk = Array.tabulate[Byte](16)(i => (i * 37 + 5).toByte)
      Png.decode(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", junk) ++
        chunk("IEND", Array.empty[Byte]))
    }
  }

  test("multi-IDAT streams concatenate (synth always splits in two)") {
    // prove the fixture really has two IDAT chunks, then that it decodes
    val png = Png.synth(3L, 8, 8, 3)
    var off = 8; var idats = 0
    while (off < png.length) {
      val len = ((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
        ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff)
      if (new String(png, off + 4, 4, "US-ASCII") == "IDAT") idats += 1
      off += 12 + len
    }
    assert(idats == 2, s"synth should emit two IDAT chunks, saw $idats")
    assert(Png.checksum(Png.decode(png)) == expectedChecksum(3L, 8, 8, 3))
  }

  test("checksum is position-sensitive (swap two pixels => different value)") {
    val img = Png.decode(Png.synth(7L, 6, 5, 3))
    val swapped = img.pixels.clone()
    for (i <- 0 until 3) {
      val t = swapped(i); swapped(i) = swapped(3 + i); swapped(3 + i) = t
    }
    assert(Png.checksum(img) !=
      Png.checksum(Png.Image(img.width, img.height, img.channels, swapped)))
  }

  test("decodePngMeta runs the real decoder through the batched plumbing") {
    import spark.implicits._
    val df = (0L until 50L).toDF("id")
      .withColumn("payload", udf { (id: Long) =>
        Png.synth(id, (5 + id % 8).toInt, (5 + id % 6).toInt, (3 + id % 2).toInt)
      }.apply(col("id")))
    val got = Multimodal.decodePngMeta(df, "id", "payload").collect()
    assert(got.length == 50)
    got.foreach { m =>
      val w = (5 + m.id % 8).toInt; val h = (5 + m.id % 6).toInt
      val ch = (3 + m.id % 2).toInt
      assert(m.width == w && m.height == h && m.channels == ch &&
        m.n_px == w.toLong * h)
      assert(m.px_checksum == expectedChecksum(m.id, w, h, ch))
    }
  }
}
