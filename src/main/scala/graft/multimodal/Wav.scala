package graft.multimodal

/** From-scratch WAV (RIFF/PCM) codec — the multimodal AUDIO path's real
  * decoder (round 4; companion to [[Bmp]]): little-endian RIFF chunk
  * walking with unknown-chunk skipping (a real-world WAV carries LIST /
  * fact / cue chunks before data), PCM 16-bit fmt parsing (mono or
  * stereo, any sample rate), interleaved sample extraction.
  *
  * `synth` is the matching deterministic encoder: an oracle can derive
  * the expected sample statistics from the generation formula alone,
  * so a decode bug (chunk mis-walk, wrong byte order, channel mixup)
  * breaks the position-weighted checksum.
  */
object Wav {

  /** Decoded clip: interleaved 16-bit samples. */
  final case class Clip(sampleRate: Int, channels: Int, samples: Array[Short])

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
  private def tag(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")

  /** Deterministic synthetic PCM16 WAV: interleaved sample index i
    * (frame-major, channel-minor) has value
    * ((seed + i * 2654435761) mod 65536) - 32768. A LIST chunk is
    * planted BEFORE the data chunk so decoders that do not walk chunks
    * properly fail loudly rather than read garbage.
    */
  def synth(seed: Long, nFrames: Int, channels: Int, sampleRate: Int = 16000): Array[Byte] = {
    require(nFrames > 0 && (channels == 1 || channels == 2), "bad synth shape")
    val nSamples = nFrames * channels
    val dataBytes = nSamples * 2
    val listBody = 12 // "INFO" + one 4-byte-id dummy entry
    // RIFF(12) + fmt(8+16) + LIST(8+listBody) + data(8+dataBytes)
    val out = new Array[Byte](12 + 24 + 8 + listBody + 8 + dataBytes)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLE32(out, 4, out.length - 8)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    var o = 12
    out(o) = 'f'; out(o + 1) = 'm'; out(o + 2) = 't'; out(o + 3) = ' '
    putLE32(out, o + 4, 16)
    putLE16(out, o + 8, 1) // PCM
    putLE16(out, o + 10, channels)
    putLE32(out, o + 12, sampleRate)
    putLE32(out, o + 16, sampleRate * channels * 2) // byte rate
    putLE16(out, o + 20, channels * 2) // block align
    putLE16(out, o + 22, 16) // bits per sample
    o += 24
    out(o) = 'L'; out(o + 1) = 'I'; out(o + 2) = 'S'; out(o + 3) = 'T'
    putLE32(out, o + 4, listBody)
    out(o + 8) = 'I'; out(o + 9) = 'N'; out(o + 10) = 'F'; out(o + 11) = 'O'
    o += 8 + listBody
    out(o) = 'd'; out(o + 1) = 'a'; out(o + 2) = 't'; out(o + 3) = 'a'
    putLE32(out, o + 4, dataBytes)
    o += 8
    var i = 0
    while (i < nSamples) {
      val v = (java.lang.Long.remainderUnsigned(seed + i.toLong * 2654435761L, 65536L) - 32768L).toInt
      putLE16(out, o + i * 2, v & 0xffff)
      i += 1
    }
    out
  }

  /** Parse a PCM16 WAV, walking chunks and skipping unknown ones. Fails
    * loudly on anything unsupported (compressed formats, 8/24-bit).
    */
  def decode(bytes: Array[Byte]): Clip = {
    require(bytes.length >= 44, s"truncated WAV (${bytes.length} bytes)")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a WAV (missing RIFF/WAVE magic)")
    var o = 12
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var samples: Array[Short] = null
    while (o + 8 <= bytes.length) {
      val id = tag(bytes, o)
      val size = readLE32(bytes, o + 4)
      require(size >= 0 && o + 8 + size <= bytes.length,
        s"chunk '$id' overruns the file")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          val fmt = readLE16(bytes, o + 8)
          require(fmt == 1, s"unsupported audio format $fmt (PCM only)")
          channels = readLE16(bytes, o + 10)
          sampleRate = readLE32(bytes, o + 12)
          bits = readLE16(bytes, o + 22)
          require(channels == 1 || channels == 2, s"unsupported channels $channels")
          require(bits == 16, s"unsupported bit depth $bits (16-bit only)")
        case "data" =>
          require(channels > 0, "data chunk before fmt chunk")
          val n = size / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = readLE16(bytes, o + 8 + i * 2).toShort; i += 1 }
          samples = s
        case _ => // LIST, fact, cue, ... — skip
      }
      o += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null, "no data chunk")
    Clip(sampleRate, channels, samples)
  }

  /** Position-weighted sample checksum: sum over interleaved index i of
    * samples(i) * (i+1) — byte-order, channel-interleave, and chunk-walk
    * errors are all observable.
    */
  def checksum(clip: Clip): Long = {
    var acc = 0L
    var i = 0
    while (i < clip.samples.length) {
      acc += clip.samples(i).toLong * (i + 1L)
      i += 1
    }
    acc
  }
}
