package graft

import graft.multimodal.{Multimodal, Y4m}
import org.apache.spark.sql.functions._

/** From-scratch Y4M video codec: roundtrip, frame sampling over decoded
  * planes, loud rejection of unsupported streams.
  */
class Y4mSpec extends SparkSpec {

  private def expectedChecksum(seed: Long, w: Int, h: Int, nf: Int): Long = {
    val fb = Y4m.frameBytes(w, h)
    (0 until nf * fb).map { p =>
      ((seed + (p / fb) * 131L + (p % fb)) % 256) * (p + 1L)
    }.sum
  }

  test("decode(synth) roundtrip across shapes") {
    for (seed <- Seq(0L, 9L, 500L); w <- Seq(8, 14); h <- Seq(6, 12); nf <- Seq(1, 5)) {
      val v = Y4m.decode(Y4m.synth(seed, w, h, nf))
      assert(v.width == w && v.height == h && v.frames.length == nf)
      assert(v.frames.forall(_.length == Y4m.frameBytes(w, h)))
      assert(Y4m.checksum(v) == expectedChecksum(seed, w, h, nf),
        s"checksum mismatch seed=$seed ${w}x$h nf=$nf")
    }
  }

  test("frame-level parameter tags after FRAME are accepted") {
    // the spec allows e.g. "FRAME Ixxx\n" — patch one marker line
    val raw = Y4m.synth(3L, 8, 6, 2)
    val s = new String(raw.map(_.toChar))
    val patched = (new String(raw, "ISO-8859-1"))
      .replaceFirst("FRAME\n", "FRAME Ip\n").getBytes("ISO-8859-1")
    assert(s.length + 3 == patched.length)
    val v = Y4m.decode(patched)
    assert(v.frames.length == 2)
    assert(Y4m.checksum(v) == expectedChecksum(3L, 8, 6, 2))
  }

  test("unsupported streams fail loudly") {
    val good = Y4m.synth(1L, 8, 6, 2)
    intercept[IllegalArgumentException](Y4m.decode("XUV4MPEG2 W8 H6\n".getBytes ++ good.drop(40)))
    // 4:2:2 chroma tag
    val s = new String(good, "ISO-8859-1").replaceFirst("C420jpeg", "C422ffff")
    intercept[IllegalArgumentException](Y4m.decode(s.getBytes("ISO-8859-1")))
    // truncated payload
    intercept[IllegalArgumentException](Y4m.decode(good.take(good.length - 5)))
    // odd dimensions
    val odd = new String(good, "ISO-8859-1").replaceFirst("W8", "W7")
    intercept[IllegalArgumentException](Y4m.decode(odd.getBytes("ISO-8859-1")))
  }

  test("sampleFrameChecksums walks genuinely decoded frames") {
    val v = Y4m.decode(Y4m.synth(11L, 8, 6, 7))
    val samples = Y4m.sampleFrameChecksums(v, every = 3)
    assert(samples.map(_._1) == Seq(0, 3, 6))
    val fb = Y4m.frameBytes(8, 6)
    samples.foreach { case (f, cs) =>
      val exp = (0 until fb).map(j => ((11L + f * 131L + j) % 256) * (j + 1L)).sum
      assert(cs == exp, s"frame $f")
    }
  }

  test("decodeY4mMeta runs the real decoder through the batched plumbing") {
    import spark.implicits._
    val df = (0L until 30L).toDF("id")
      .withColumn("payload", udf { (id: Long) =>
        Y4m.synth(id, (8 + 2 * (id % 5)).toInt, (6 + 2 * (id % 4)).toInt,
          (3 + id % 4).toInt)
      }.apply(col("id")))
    val got = Multimodal.decodeY4mMeta(df, "id", "payload").collect()
    assert(got.length == 30)
    got.foreach { m =>
      val w = (8 + 2 * (m.id % 5)).toInt; val h = (6 + 2 * (m.id % 4)).toInt
      val nf = (3 + m.id % 4).toInt
      assert(m.width == w && m.height == h && m.n_frames == nf)
      assert(m.yuv_checksum == expectedChecksum(m.id, w, h, nf))
    }
  }
}
