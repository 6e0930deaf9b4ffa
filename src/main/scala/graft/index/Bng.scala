package graft.index

import graft.core.Constants

/** British National Grid reference math: (easting, northing) <-> grid ref
  * strings at power-of-ten resolutions (100 km .. 1 m).
  *
  * Re-implements, from the public OSGB specification, the cell-encoding
  * semantics the reference delegates to the external `bng_indexer` package
  * (`/root/reference/src/sds_data_model/dataframe.py:337-413`). Pure integer
  * math — deterministic across partitions and parallelism levels.
  */
object Bng {
  /** 5x5 grid letters, 'I' skipped per OS convention. */
  private val Letters = "ABCDEFGHJKLMNOPQRSTUVWXYZ"

  val Resolutions: Seq[Long] = Seq(100000L, 10000L, 1000L, 100L, 10L, 1L)

  def inBounds(e: Double, n: Double): Boolean =
    e >= 0 && e < Constants.BngXMax && n >= 0 && n < Constants.BngYMax

  /** Number of digit pairs for a resolution (0 at 100 km, 1 at 10 km, ...). */
  def digitsFor(resolution: Long): Int = resolution match {
    case 100000L => 0
    case 10000L  => 1
    case 1000L   => 2
    case 100L    => 3
    case 10L     => 4
    case 1L      => 5
    case r => throw new IllegalArgumentException(s"unsupported BNG resolution $r")
  }

  /** Two-letter 100 km square prefix for integer 100km indices. */
  def letterPair(e100k: Int, n100k: Int): String = {
    // Standard OSGB letter-pair derivation (public algorithm).
    val l1 = (19 - n100k) - (19 - n100k) % 5 + (e100k + 10) / 5
    val l2 = ((19 - n100k) * 5) % 25 + e100k % 5
    s"${Letters.charAt(l1)}${Letters.charAt(l2)}"
  }

  /** Grid reference for a point at a given resolution, e.g.
    * gridRef(432674, 432342, 10000) == "SE3232". Hot path at 10^12 rows:
    * hand-rolled digit building (String.format costs more than the rest
    * of the encoder combined).
    */
  def gridRef(e: Double, n: Double, resolution: Long): String = {
    require(inBounds(e, n), s"point ($e, $n) outside BNG extent")
    val ei = e.toLong
    val ni = n.toLong
    val e100k = (ei / 100000L).toInt
    val n100k = (ni / 100000L).toInt
    val l1 = (19 - n100k) - (19 - n100k) % 5 + (e100k + 10) / 5
    val l2 = ((19 - n100k) * 5) % 25 + e100k % 5
    val d = digitsFor(resolution)
    val out = new Array[Char](2 + 2 * d)
    out(0) = Letters.charAt(l1)
    out(1) = Letters.charAt(l2)
    if (d > 0) {
      var eDigits = (ei % 100000L) / resolution
      var nDigits = (ni % 100000L) / resolution
      var i = d - 1
      while (i >= 0) {
        out(2 + i) = ('0' + (eDigits % 10)).toChar
        out(2 + d + i) = ('0' + (nDigits % 10)).toChar
        eDigits /= 10
        nDigits /= 10
        i -= 1
      }
    }
    new String(out)
  }

  /** [[gridRef]] as raw ASCII bytes — feeds UTF8String.fromBytes directly
    * in the Catalyst encoder without a String/charset round-trip.
    */
  def gridRefAscii(e: Double, n: Double, resolution: Long): Array[Byte] = {
    require(inBounds(e, n), s"point ($e, $n) outside BNG extent")
    val ei = e.toLong
    val ni = n.toLong
    val e100k = (ei / 100000L).toInt
    val n100k = (ni / 100000L).toInt
    val l1 = (19 - n100k) - (19 - n100k) % 5 + (e100k + 10) / 5
    val l2 = ((19 - n100k) * 5) % 25 + e100k % 5
    val d = digitsFor(resolution)
    val out = new Array[Byte](2 + 2 * d)
    out(0) = Letters.charAt(l1).toByte
    out(1) = Letters.charAt(l2).toByte
    if (d > 0) {
      var eDigits = (ei % 100000L) / resolution
      var nDigits = (ni % 100000L) / resolution
      var i = d - 1
      while (i >= 0) {
        out(2 + i) = ('0' + (eDigits % 10)).toByte
        out(2 + d + i) = ('0' + (nDigits % 10)).toByte
        eDigits /= 10
        nDigits /= 10
        i -= 1
      }
    }
    out
  }

  /** Inverse of [[gridRef]]: (minE, minN, resolution) of a grid ref. */
  def parse(ref: String): (Long, Long, Long) = {
    require(ref.length >= 2 && ref.length % 2 == 0, s"bad BNG ref '$ref'")
    val i1 = Letters.indexOf(ref.charAt(0))
    val i2 = Letters.indexOf(ref.charAt(1))
    require(i1 >= 0 && i2 >= 0, s"bad BNG letters in '$ref'")
    // Invert letterPair.
    val e100k = (i1 % 5 - 2) * 5 + (i2 % 5)
    val n100k = (19 - (i1 / 5) * 5) - (i2 / 5)
    val d = (ref.length - 2) / 2
    val res = Resolutions(d)
    val eDigits = if (d == 0) 0L else ref.substring(2, 2 + d).toLong
    val nDigits = if (d == 0) 0L else ref.substring(2 + d).toLong
    (e100k * 100000L + eDigits * res, n100k * 100000L + nDigits * res, res)
  }

  /** Bounds (minx, miny, maxx, maxy) of a grid ref — reference
    * `_bng_to_bounds` (`_dataframe.py:43-55`).
    */
  def bounds(ref: String): (Double, Double, Double, Double) = {
    val (e, n, res) = parse(ref)
    (e.toDouble, n.toDouble, (e + res).toDouble, (n + res).toDouble)
  }

  /** All grid refs whose cells intersect the envelope
    * [minx, maxx] x [miny, maxy], clamped to the BNG extent.
    * Cells are half-open [min, min+res); an envelope touching a cell's
    * upper edge exactly still includes that cell (closed envelope), matching
    * shapely/bng_indexer "bounding box" semantics.
    */
  def envelopeCells(minx: Double, miny: Double, maxx: Double, maxy: Double,
      resolution: Long): Seq[String] = {
    val d = digitsFor(resolution) // validates resolution
    val _ = d
    val loE = math.max(0L, math.floor(minx / resolution).toLong)
    val hiE = math.min(Constants.BngXMax / resolution - 1,
      math.floor(maxx / resolution).toLong)
    val loN = math.max(0L, math.floor(miny / resolution).toLong)
    val hiN = math.min(Constants.BngYMax / resolution - 1,
      math.floor(maxy / resolution).toLong)
    val out = Seq.newBuilder[String]
    var nn = loN
    while (nn <= hiN) {
      var ee = loE
      while (ee <= hiE) {
        out += gridRef((ee * resolution).toDouble, (nn * resolution).toDouble,
          resolution)
        ee += 1
      }
      nn += 1
    }
    out.result()
  }

  /** Integer cell key (e/res, n/res packed) for compact long-typed joins:
    * cellId = eIdx * (BngYMax/res) + nIdx. Stable per resolution.
    */
  def cellId(e: Double, n: Double, resolution: Long): Long = {
    val eIdx = math.floor(e / resolution).toLong
    val nIdx = math.floor(n / resolution).toLong
    eIdx * (Constants.BngYMax / resolution) + nIdx
  }
}
