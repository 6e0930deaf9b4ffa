package graft.multimodal

/** From-scratch BMP (Windows DIB) codec — the multimodal column's REAL
  * decoder (round 4; the container ships no image libraries, so the
  * format is implemented directly from the public BITMAPFILEHEADER /
  * BITMAPINFOHEADER layout): 24-bit uncompressed (BI_RGB) pixel data,
  * little-endian headers, 4-byte-padded rows, bottom-up storage for
  * positive biHeight and top-down for negative, BGR byte order on disk.
  *
  * `synth` is the matching deterministic encoder used to build test /
  * driver fixtures whose expected pixel statistics an external oracle
  * can derive from the generation formula alone — a decoder bug (wrong
  * padding, wrong row order, BGR/RGB swap) breaks the position-weighted
  * checksum.
  */
object Bmp {

  /** Decoded image: `rgb` is top-down row-major, 3 bytes (R,G,B) per
    * pixel, padding stripped.
    */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def readLE16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)
  private def readLE32(b: Array[Byte], o: Int): Int =
    u8(b, o) | (u8(b, o + 1) << 8) | (u8(b, o + 2) << 16) | (u8(b, o + 3) << 24)
  private def putLE16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
  }
  private def putLE32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }

  private def rowSize(width: Int): Int = (width * 3 + 3) / 4 * 4

  /** Deterministic synthetic 24-bit BMP: pixel p = y*w + x (top-down
    * row-major) has r=(seed+3p)%256, g=(seed+3p+1)%256, b=(seed+3p+2)%256.
    * Stored bottom-up with standard row padding — the layout a decoder
    * must actually undo.
    */
  def synth(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, "degenerate image")
    val rs = rowSize(w)
    val dataSize = rs * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLE32(out, 2, out.length)
    putLE32(out, 10, 54) // pixel data offset
    putLE32(out, 14, 40) // BITMAPINFOHEADER size
    putLE32(out, 18, w)
    putLE32(out, 22, h) // positive => bottom-up
    putLE16(out, 26, 1) // planes
    putLE16(out, 28, 24) // bpp
    putLE32(out, 30, 0) // BI_RGB
    putLE32(out, 34, dataSize)
    putLE32(out, 38, 2835); putLE32(out, 42, 2835) // 72 dpi
    var y = 0
    while (y < h) {
      val dst = 54 + (h - 1 - y) * rs
      var x = 0
      while (x < w) {
        val p = y.toLong * w + x
        val o = dst + x * 3
        out(o) = ((seed + 3L * p + 2) % 256).toByte // B
        out(o + 1) = ((seed + 3L * p + 1) % 256).toByte // G
        out(o + 2) = ((seed + 3L * p) % 256).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bit uncompressed BMP. Fails loudly (IllegalArgumentException)
    * on anything the codec does not support — a silent wrong decode is
    * worse than a clear error.
    */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54, s"truncated BMP header (${bytes.length} bytes)")
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP (missing BM magic)")
    val pixelOffset = readLE32(bytes, 10)
    val dibSize = readLE32(bytes, 14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = readLE32(bytes, 18)
    val rawHeight = readLE32(bytes, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = readLE16(bytes, 28)
    val compression = readLE32(bytes, 30)
    require(width > 0 && height > 0, s"degenerate dimensions ${width}x$rawHeight")
    require(bpp == 24, s"unsupported bpp $bpp (24-bit only)")
    require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
    val rs = rowSize(width)
    require(bytes.length.toLong >= pixelOffset.toLong + rs.toLong * height,
      "truncated pixel data")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = pixelOffset + (if (topDown) y else height - 1 - y) * rs
      var x = 0
      while (x < width) {
        val s = srcRow + x * 3
        val d = (y * width + x) * 3
        rgb(d) = bytes(s + 2) // R (disk is BGR)
        rgb(d + 1) = bytes(s + 1)
        rgb(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    Image(width, height, rgb)
  }

  /** Position-weighted pixel checksum: sum over top-down row-major pixel
    * index p of (r + 2g + 3b) * (p+1). Position weighting makes row
    * order, padding handling, and channel order all observable — an
    * unweighted sum would forgive a decoder that shuffles pixels.
    */
  def checksum(img: Image): Long = {
    var acc = 0L
    var p = 0
    val n = img.width * img.height
    while (p < n) {
      val o = p * 3
      acc += ((img.rgb(o) & 0xff) + 2L * (img.rgb(o + 1) & 0xff) +
        3L * (img.rgb(o + 2) & 0xff)) * (p + 1L)
      p += 1
    }
    acc
  }
}
