package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column support: image/audio/video payloads ride through the
  * engine as opaque `BinaryType` columns with typed metadata structs.
  *
  * All three modalities decode for REAL with from-scratch codecs, each
  * driver-oracled by a position-weighted checksum: IMAGE via [[Bmp]]
  * (24-bit DIB, q60), [[Png]] (8-bit RGB/RGBA, zlib DEFLATE, all five
  * scanline filters, q64) and [[Jpeg]] (baseline T.81 — Huffman entropy
  * decode, IDCT, 4:2:0 upsampling, q66), AUDIO via [[Wav]] (RIFF/PCM16
  * chunk walk, q62), VIDEO via [[Y4m]] (YUV4MPEG2 planar 4:2:0 frames,
  * q63). They
  * share one plumbing shape: schema, per-partition batched decoding (one
  * decoder instance per partition — what a JNI/FFmpeg binding would
  * need), and feature columns that downstream ops (dedup, ANN) consume.
  * [[decodeOne]]/[[decodeMeta]] keep the original deterministic-fake
  * path for formats with no in-container codec.
  */
object Multimodal {

  /** Typed decoded-media metadata row. */
  case class MediaMeta(
      id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_byte: Double)

  /** Deterministic FAKE decode of an opaque binary payload.
    * Width/height/channels derive from the byte length (stable,
    * SQL-recomputable); mean_byte summarizes content. A real build swaps
    * `decodeOne` for an actual codec — everything around it stays.
    */
  def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    MediaMeta(
      id = id,
      n_bytes = n,
      width = (1L + n % 64L).toInt,
      height = (1L + n % 37L).toInt,
      channels = (1L + n % 3L).toInt,
      mean_byte = if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Batched decode over a (id, payload) binary column: mapPartitions so a
    * real decoder would initialize once per partition/batch, not per row.
    */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // [decoder init would go here — once per partition]
        it.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  /** Typed decoded-image row (real decode path). */
  case class ImageMeta(
      id: Long,
      width: Int,
      height: Int,
      n_px: Long,
      px_checksum: Long)

  /** REAL batched image decode over a (id, payload) binary column: each
    * payload is parsed by the from-scratch [[Bmp]] codec (headers, row
    * padding, bottom-up order, BGR) and summarized as a position-weighted
    * pixel checksum. mapPartitions keeps the decoder-per-partition shape
    * shared with [[decodeMeta]].
    */
  def decodeBmpMeta(df: DataFrame, idCol: String, binCol: String): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = Bmp.decode(bytes)
          ImageMeta(id, img.width, img.height,
            img.width.toLong * img.height, Bmp.checksum(img))
        }
      }
  }

  /** Typed decoded-PNG row (real decode path — carries channels because
    * the codec handles both RGB and RGBA).
    */
  case class PngMeta(
      id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_px: Long,
      px_checksum: Long)

  /** REAL batched PNG decode over a (id, payload) binary column: each
    * payload is parsed by the from-scratch [[Png]] codec (chunk walk +
    * CRC, multi-IDAT zlib inflate, filter reconstruction) and summarized
    * as a position-weighted pixel checksum. Same decoder-per-partition
    * shape as the other modalities.
    */
  def decodePngMeta(df: DataFrame, idCol: String, binCol: String): Dataset[PngMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = Png.decode(bytes)
          PngMeta(id, img.width, img.height, img.channels,
            img.width.toLong * img.height, Png.checksum(img))
        }
      }
  }

  /** Typed decoded-JPEG row (real decode path). */
  case class JpegMeta(
      id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_px: Long,
      px_checksum: Long)

  /** REAL batched JPEG decode over a (id, payload) binary column: each
    * payload is parsed by the from-scratch [[Jpeg]] baseline codec
    * (marker walk, Huffman + DC-diff + restart entropy decode, dequant,
    * IDCT, 4:2:0 upsampling, YCbCr->RGB) and summarized as a
    * position-weighted pixel checksum. Same decoder-per-partition shape
    * as the other modalities.
    */
  def decodeJpegMeta(df: DataFrame, idCol: String, binCol: String): Dataset[JpegMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = Jpeg.decode(bytes)
          JpegMeta(id, img.width, img.height, img.channels,
            img.width.toLong * img.height, Jpeg.checksum(img))
        }
      }
  }

  /** Typed decoded-audio row (real decode path). */
  case class AudioMeta(
      id: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      pcm_checksum: Long)

  /** REAL batched audio decode over a (id, payload) binary column: each
    * payload parses through the from-scratch [[Wav]] RIFF/PCM16 codec
    * (chunk walk, unknown-chunk skip, interleave) and summarizes as a
    * position-weighted sample checksum.
    */
  def decodeWavMeta(df: DataFrame, idCol: String, binCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val clip = Wav.decode(bytes)
          AudioMeta(id, clip.sampleRate, clip.channels,
            clip.samples.length.toLong, Wav.checksum(clip))
        }
      }
  }

  /** Typed decoded-video row (real decode path). */
  case class VideoMeta(
      id: Long,
      width: Int,
      height: Int,
      n_frames: Long,
      yuv_checksum: Long)

  /** REAL batched video decode over a (id, payload) binary column: each
    * payload parses through the from-scratch [[Y4m]] codec (stream
    * header, FRAME markers, planar 4:2:0 payload) and summarizes as a
    * position-weighted plane-byte checksum.
    */
  def decodeY4mMeta(df: DataFrame, idCol: String, binCol: String): Dataset[VideoMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val v = Y4m.decode(bytes)
          VideoMeta(id, v.width, v.height, v.frames.length.toLong, Y4m.checksum(v))
        }
      }
  }

  /** Deterministic fake frame-sample: byte-slices of the payload standing
    * in for decoded frames (`every`-th 16-byte window), exploded one row
    * per frame — the partitioning/UDTF shape of real video frame
    * extraction.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      every: Int = 4): DataFrame = {
    val frameUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Array.empty[Array[Byte]]
      else bytes.grouped(16).zipWithIndex
        .collect { case (w, i) if i % every == 0 => w }
        .toArray
    }
    df.select(col(idCol),
      posexplode(frameUdf(col(binCol))).as(Seq("frame_no", "frame")))
  }
}
