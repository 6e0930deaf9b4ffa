package graft

import graft.multimodal.{Multimodal, Wav}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** From-scratch WAV/PCM16 codec: roundtrip with chunk walking, mono and
  * stereo interleave, loud rejection of unsupported formats.
  */
class WavSpec extends SparkSpec {

  private def expectedChecksum(seed: Long, nSamples: Int): Long =
    (0 until nSamples).map { i =>
      (java.lang.Long.remainderUnsigned(seed + i.toLong * 2654435761L, 65536L) - 32768L) * (i + 1L)
    }.sum

  test("decode(synth) roundtrip mono + stereo, LIST chunk skipped") {
    for (seed <- Seq(0L, 7L, 9999L); ch <- Seq(1, 2); frames <- Seq(1, 33, 160)) {
      val clip = Wav.decode(Wav.synth(seed, frames, ch))
      assert(clip.channels == ch && clip.sampleRate == 16000)
      assert(clip.samples.length == frames * ch)
      assert(Wav.checksum(clip) == expectedChecksum(seed, frames * ch),
        s"checksum mismatch seed=$seed ch=$ch frames=$frames")
    }
  }

  test("unsupported inputs fail loudly") {
    val good = Wav.synth(1L, 10, 1)
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Wav.decode(badMagic))
    intercept[IllegalArgumentException](Wav.decode(good.take(30)))
    // non-PCM format code
    val alaw = good.clone(); alaw(20) = 6
    intercept[IllegalArgumentException](Wav.decode(alaw))
    // 8-bit depth
    val b8 = good.clone(); b8(34) = 8
    intercept[IllegalArgumentException](Wav.decode(b8))
    // overrunning chunk size
    val overrun = good.clone(); overrun(16) = 0x7f.toByte; overrun(17) = 0x7f.toByte
    intercept[IllegalArgumentException](Wav.decode(overrun))
  }

  test("decodeWavMeta runs the real decoder through the batched plumbing") {
    import spark.implicits._
    val df = (0L until 40L).toDF("id")
      .withColumn("payload", udf { (id: Long) =>
        Wav.synth(id, (100 + id % 50).toInt, (1 + id % 2).toInt)
      }.apply(col("id")))
    val got = Multimodal.decodeWavMeta(df, "id", "payload").collect()
    assert(got.length == 40)
    got.foreach { m =>
      val n = (100 + m.id % 50).toInt * (1 + m.id % 2).toInt
      assert(m.n_samples == n && m.sample_rate == 16000)
      assert(m.pcm_checksum == expectedChecksum(m.id, n))
    }
  }
}
