package graft.multimodal

/** From-scratch Y4M (YUV4MPEG2) codec — the multimodal VIDEO path's real
  * decoder (round 4; completes the image/audio/video triple with [[Bmp]]
  * and [[Wav]]): ASCII stream header (`YUV4MPEG2 W.. H.. F..:.. ...`),
  * per-frame `FRAME` markers, raw planar YUV 4:2:0 payload (Y = WxH
  * bytes, U and V = (W/2)x(H/2) each). Y4M is the uncompressed
  * interchange format the open-source video toolchain (mjpegtools,
  * ffmpeg) uses — a real container with no entropy coding, so a full
  * parser is feasible from the public spec alone.
  *
  * `synth` is the matching deterministic encoder; an oracle derives the
  * expected plane statistics from the generation formula, so a decode
  * bug (header mis-parse, frame-marker mis-walk, plane-size error)
  * breaks the position-weighted checksum.
  */
object Y4m {

  /** Decoded clip: `frames(f)` is the concatenated Y,U,V planes of frame
    * f (length W*H*3/2).
    */
  final case class Video(width: Int, height: Int, frames: Array[Array[Byte]])

  def frameBytes(w: Int, h: Int): Int = w * h + 2 * ((w / 2) * (h / 2))

  /** Deterministic synthetic clip: byte j of frame f (planar Y,U,V
    * order) has value (seed + f*131 + j) mod 256. Even dimensions
    * required by 4:2:0 subsampling.
    */
  def synth(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, "4:2:0 needs even dims")
    require(nFrames > 0, "empty clip")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val fb = frameBytes(w, h)
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + nFrames * (marker.length + fb))
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    var f = 0
    while (f < nFrames) {
      System.arraycopy(marker, 0, out, o, marker.length)
      o += marker.length
      var j = 0
      while (j < fb) {
        out(o + j) = ((seed + f * 131L + j) % 256).toByte
        j += 1
      }
      o += fb
      f += 1
    }
    out
  }

  /** Parse a Y4M stream: header params (W/H mandatory, other tags
    * skipped; only C420 family supported), then FRAME-delimited raw
    * planes. Frame-level parameter tags (allowed by the spec after
    * `FRAME`) are accepted and ignored. Fails loudly on anything else.
    */
  def decode(bytes: Array[Byte]): Video = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "no stream header line")
    val header = new String(bytes, 0, nl, "US-ASCII")
    require(header.startsWith("YUV4MPEG2"), "not a Y4M stream")
    var w = -1
    var h = -1
    header.split(' ').drop(1).foreach { tag =>
      if (tag.nonEmpty) tag.charAt(0) match {
        case 'W' => w = tag.substring(1).toInt
        case 'H' => h = tag.substring(1).toInt
        case 'C' => require(tag.startsWith("C420"),
          s"unsupported chroma ${tag.substring(1)} (4:2:0 only)")
        case _ => // F (rate), I (interlace), A (aspect), X (extension) — skip
      }
    }
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, s"bad dimensions ${w}x$h")
    val fb = frameBytes(w, h)
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var o = nl + 1
    while (o < bytes.length) {
      require(o + 5 <= bytes.length &&
        new String(bytes, o, 5, "US-ASCII") == "FRAME",
        s"missing FRAME marker at offset $o")
      val fnl = bytes.indexOf('\n'.toByte, o)
      require(fnl > 0, "unterminated FRAME header")
      o = fnl + 1
      require(o + fb <= bytes.length, "truncated frame payload")
      frames += java.util.Arrays.copyOfRange(bytes, o, o + fb)
      o += fb
    }
    require(frames.nonEmpty, "no frames")
    Video(w, h, frames.toArray)
  }

  /** Position-weighted checksum over the clip's every plane byte, global
    * index across frames — frame order, plane sizes, and marker walking
    * are all observable.
    */
  def checksum(v: Video): Long = {
    val fb = frameBytes(v.width, v.height)
    var acc = 0L
    var f = 0
    while (f < v.frames.length) {
      val fr = v.frames(f)
      var j = 0
      while (j < fb) {
        acc += (fr(j) & 0xff).toLong * (f.toLong * fb + j + 1L)
        j += 1
      }
      f += 1
    }
    acc
  }

  /** Every `every`-th frame's per-frame checksum — the frame-sampling
    * shape of real video feature extraction, over genuinely decoded
    * frames.
    */
  def sampleFrameChecksums(v: Video, every: Int): Seq[(Int, Long)] = {
    val fb = frameBytes(v.width, v.height)
    v.frames.indices.collect {
      case f if f % every == 0 =>
        val fr = v.frames(f)
        var acc = 0L
        var j = 0
        while (j < fb) { acc += (fr(j) & 0xff).toLong * (j + 1L); j += 1 }
        (f, acc)
    }
  }
}
