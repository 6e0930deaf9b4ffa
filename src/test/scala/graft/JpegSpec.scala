package graft

import graft.multimodal.Jpeg

/** From-scratch baseline JPEG codec: zigzag contract, DC-only exactness
  * across grayscale / 4:4:4 / 4:2:0 (the q66 closed form), the full
  * AC run/size + zigzag + IDCT path against independent references,
  * restart markers, byte stuffing, and loud rejection of everything the
  * baseline scope excludes.
  */
class JpegSpec extends SparkSpec {

  test("zigzag order matches T.81 Figure A.6") {
    // first ten serialized positions in natural (row-major) indices
    assert(Jpeg.zigzag.take(10).toSeq ==
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(Jpeg.zigzag.sorted.toSeq == (0 until 64).toSeq, "must be a permutation")
    assert(Jpeg.zigzag(63) == 63)
  }

  private def closedFormPixel(doc: Long, mode: Int, w: Int, h: Int,
      x: Int, y: Int, c: Int): Int = {
    def v(comp: Int, bx: Int, by: Int) = Jpeg.synthValue(doc, comp, bx, by)
    if (mode == 0) v(0, x / 8, y / 8)
    else {
      val cs = if (mode == 2) 16 else 8
      val yv = v(0, x / 8, y / 8).toDouble
      val cb = v(1, x / cs, y / cs).toDouble
      val cr = v(2, x / cs, y / cs).toDouble
      val d = c match {
        case 0 => yv + 1.402 * (cr - 128.0)
        case 1 => yv + (-0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
        case 2 => yv + 1.772 * (cb - 128.0)
      }
      val p = math.floor(d + 0.5).toInt
      if (p < 0) 0 else if (p > 255) 255 else p
    }
  }

  test("DC-only synth decodes to the exact closed form in all three modes") {
    for (doc <- 0L until 12L) {
      val mode = (doc % 3).toInt
      val bx = if (mode == 2) (2 * (1 + doc % 2)).toInt else (1 + doc % 3).toInt
      val by = if (mode == 2) 2 else (1 + doc % 2).toInt
      val bytes = Jpeg.synth(doc, mode, bx, by)
      val img = Jpeg.decode(bytes)
      assert(img.width == bx * 8 && img.height == by * 8, s"dims doc=$doc")
      assert(img.channels == (if (mode == 0) 1 else 3), s"channels doc=$doc")
      var i = 0
      for (y <- 0 until img.height; x <- 0 until img.width;
           c <- 0 until img.channels) {
        val exp = closedFormPixel(doc, mode, img.width, img.height, x, y, c)
        assert((img.pixels(i) & 0xff) == exp,
          s"doc=$doc mode=$mode pixel ($x,$y,$c): got ${img.pixels(i) & 0xff}, want $exp")
        i += 1
      }
    }
  }

  test("restart markers and predictor resets are load-bearing") {
    // 4 MCUs with interval 2 -> at least one RSTn in the stream
    val bytes = Jpeg.synth(5L, 0, 2, 2)
    val hasRst = bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "synth stream must contain an RSTn marker")
    assert(Jpeg.decode(bytes).width == 16)
  }

  test("byte stuffing occurs in the corpus and decodes correctly") {
    // across many docs, some entropy byte hits 0xFF and gets stuffed —
    // find one to prove the unstuffing path runs (decode correctness of
    // those very streams is covered by the closed-form test above)
    val found = (0L until 200L).exists { doc =>
      val mode = (doc % 3).toInt
      val bx = if (mode == 2) (2 * (1 + doc % 2)).toInt else (1 + doc % 3).toInt
      val by = if (mode == 2) 2 else (1 + doc % 2).toInt
      val b = Jpeg.synth(doc, mode, bx, by)
      // scan only the entropy segment (after SOS header, before EOI)
      val sos = b.indices.find(i => i + 1 < b.length &&
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda).get
      (sos until b.length - 2).exists(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0x00)
    }
    assert(found, "no stuffed 0xFF00 found in 200 synth streams")
  }

  test("AC path: single-block streams reproduce the reference IDCT") {
    val cases = Seq(
      // DC + one low-frequency AC
      Array.tabulate(64)(i => if (i == 0) 80 else if (i == 1) -40 else 0),
      // long zero run forcing ZRL (natural index 63 is late in zigzag)
      Array.tabulate(64)(i => if (i == 0) -200 else if (i == 63) 25 else 0),
      // dense checkerboard-ish coefficients
      Array.tabulate(64)(i => ((i * 37) % 41) - 20),
      // all zero (DC category 0 + immediate EOB)
      Array.fill(64)(0))
    cases.foreach { coeffs =>
      val img = Jpeg.decode(Jpeg.synthBlock(coeffs))
      assert(img.width == 8 && img.height == 8 && img.channels == 1)
      val ref = Jpeg.idctBlock(coeffs)
      (0 until 64).foreach { i =>
        assert((img.pixels(i) & 0xff) == ref(i),
          s"pixel $i: got ${img.pixels(i) & 0xff}, ref ${ref(i)}")
      }
    }
  }

  test("zigzag de-serialization is load-bearing (not identity)") {
    // coefficient at natural index 8 (row 1, col 0) sits at zigzag
    // position 2 — a decoder reading coefficients in natural order
    // would place it elsewhere and fail the reference compare
    val coeffs = Array.tabulate(64)(i => if (i == 0) 0 else if (i == 8) 99 else 0)
    val img = Jpeg.decode(Jpeg.synthBlock(coeffs))
    val ref = Jpeg.idctBlock(coeffs)
    assert((0 until 64).forall(i => (img.pixels(i) & 0xff) == ref(i)))
    // and the pattern is vertical (varies by row, constant across cols)
    val rows = (0 until 8).map(y => img.pixels(y * 8) & 0xff)
    assert(rows.distinct.size > 1, "vertical AC pattern expected")
    (0 until 8).foreach { y =>
      assert((0 until 8).forall(x => (img.pixels(y * 8 + x) & 0xff) == rows(y)))
    }
  }

  test("unsupported and corrupt streams are rejected loudly") {
    val good = Jpeg.synth(1L, 1, 2, 1)
    // not a JPEG
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3, 4)))
    // progressive SOF2
    val prog = good.clone()
    val sof = prog.indices.find(i => i + 1 < prog.length &&
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](Jpeg.decode(prog))
    // truncated entropy stream
    intercept[IllegalArgumentException](Jpeg.decode(good.dropRight(8)))
    // 16-bit quantization table (Pq=1)
    val dqt = good.clone()
    val q = dqt.indices.find(i => i + 1 < dqt.length &&
      (dqt(i) & 0xff) == 0xff && (dqt(i + 1) & 0xff) == 0xdb).get
    dqt(q + 4) = 0x10.toByte
    intercept[IllegalArgumentException](Jpeg.decode(dqt))
  }

  test("q66 plumbing: Spark-side decode matches the closed-form checksum") {
    import spark.implicits._
    val docs = (0L until 30L).toDF("doc_id")
    val synth = org.apache.spark.sql.functions.udf { (id: Long) =>
      val mode = (id % 3).toInt
      val bx = if (mode == 2) (2 * (1 + id % 2)).toInt else (1 + id % 3).toInt
      val by = if (mode == 2) 2 else (1 + id % 2).toInt
      Jpeg.synth(id, mode, bx, by)
    }
    val got = graft.multimodal.Multimodal.decodeJpegMeta(
        docs.withColumn("payload", synth(org.apache.spark.sql.functions.col("doc_id"))),
        "doc_id", "payload")
      .collect().map(m => m.id -> m).toMap
    (0L until 30L).foreach { doc =>
      val mode = (doc % 3).toInt
      val bxn = if (mode == 2) (2 * (1 + doc % 2)).toInt else (1 + doc % 3).toInt
      val byn = if (mode == 2) 2 else (1 + doc % 2).toInt
      val (w, h) = (bxn * 8, byn * 8)
      val ch = if (mode == 0) 1 else 3
      var sum = 0L
      var p = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch) {
        sum += (p + 1L) * closedFormPixel(doc, mode, w, h, x, y, c)
        p += 1
      }
      val m = got(doc)
      assert(m.width == w && m.height == h && m.channels == ch)
      assert(m.px_checksum == sum, s"doc=$doc checksum")
    }
  }
}
