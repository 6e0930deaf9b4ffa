package graft.core

/** Engine-wide constants.
  *
  * BNG canvas geometry mirrors the reference's
  * `/root/reference/src/sds_data_model/constants.py:5-20` (British National
  * Grid extent 700 km x 1,300 km, 10 m cells, 100 km boxes) with the graft's
  * additional 10 km tiling resolution.
  */
object Constants {
  // British National Grid (EPSG:27700) canvas extent in metres.
  val BngXMin: Long = 0L
  val BngYMin: Long = 0L
  val BngXMax: Long = 700000L  // constants.py:8  (easting)
  val BngYMax: Long = 1300000L // constants.py:9  (northing)

  /** Raster cell size in metres (constants.py:11). */
  val CellSize: Long = 10L

  /** 100 km tile edge (constants.py:14 BOX_SIZE). */
  val BoxSize: Long = 100000L

  /** Cells per 100 km tile edge: 10_000 (constants.py:17-20 OUT_SHAPE). */
  val TileCells: Int = (BoxSize / CellSize).toInt

  /** The graft's finer tiling resolution: 10 km (north_rule). */
  val TileSize10k: Long = 10000L

  /** 7 x 13 grid of 100 km tiles covering the canvas (constants.py:49-77). */
  val TilesX: Int = (BngXMax / BoxSize).toInt // 7
  val TilesY: Int = (BngYMax / BoxSize).toInt // 13

  /** Per-dtype nodata sentinels (reference `_dataframe.py:207-220`).
    * Unsigned dtypes keep the reference's sentinel values even though the
    * JVM stores them in the next wider signed type.
    */
  val DtypeNodata: Map[String, Double] = Map(
    "uint8" -> 255d,
    "uint16" -> 65535d,
    "uint32" -> 4294967295d,
    "uint64" -> Long.MaxValue.toDouble, // 2^64-1 unrepresentable; widest signed max
    "int16" -> 32767d,
    "int32" -> 2147483647d,
    "int64" -> Long.MaxValue.toDouble,
    "float32" -> Double.NaN,
    "float64" -> Double.NaN
  )

  /** Dtype widening order — EXACTLY the reference's `dtype_nodata_value`
    * dict order (`_dataframe.py:207-220`): no int8 (commented out there),
    * intN before uintN at each width. The `_next_dtype` collision walk
    * steps through this sequence, so sentinel collisions resolve to the
    * same (dtype, nodata) the reference picks — e.g. data [0, 255] widens
    * to (int16, 32767), not (uint16, 65535). One documented deviation:
    * we additionally require the candidate's RANGE to hold the data, so
    * pathological inputs (e.g. negative min with max above 2^15) never
    * land in an unsigned dtype the way the reference's literal chain can.
    */
  val DtypeOrder: Seq[String] = Seq(
    "uint8", "int16", "uint16", "int32", "uint32",
    "int64", "uint64", "float32", "float64")

  /** Dtype value ranges for the minimum-dtype ladder
    * (reference `_dataframe.py:227-268`).
    */
  val DtypeRange: Map[String, (Double, Double)] = Map(
    "uint8" -> (0d, 255d),
    "uint16" -> (0d, 65535d),
    "int16" -> (-32768d, 32767d),
    "uint32" -> (0d, 4294967295d),
    "int32" -> (-2147483648d, 2147483647d),
    "uint64" -> (0d, 9.223372036854776e18),
    "int64" -> (-9.223372036854776e18, 9.223372036854776e18),
    "float32" -> (-3.4028235e38, 3.4028235e38),
    "float64" -> (Double.MinValue, Double.MaxValue)
  )

  /** Minimum dtype that holds [lo, hi], reference `_get_minimum_dtype`
    * (`_dataframe.py:227-268`): smallest integer dtype if both bounds are
    * integral, else smallest float dtype.
    */
  def minimumDtype(lo: Double, hi: Double): String = {
    val integral = lo == Math.rint(lo) && hi == Math.rint(hi) &&
      !lo.isInfinite && !hi.isInfinite
    val candidates =
      if (integral) DtypeOrder.filterNot(_.startsWith("float"))
      else DtypeOrder.filter(_.startsWith("float"))
    candidates.find { d =>
      val (dlo, dhi) = DtypeRange(d)
      lo >= dlo && hi <= dhi
    }.getOrElse("float64")
  }

  /** Minimum dtype that both holds [lo, hi] AND has a nodata sentinel not
    * colliding with the column max (reference `_get_minimum_dtypes_and
    * _nodata` + `_next_dtype`, `_dataframe.py:347-398`): walk the ladder,
    * skipping dtypes whose range doesn't hold the data or whose sentinel
    * would be a real value.
    */
  def dtypeAndNodata(lo: Double, hi: Double): (String, Double) = {
    val integral = lo == Math.rint(lo) && hi == Math.rint(hi) &&
      !lo.isInfinite && !hi.isInfinite
    val candidates =
      if (integral) DtypeOrder else DtypeOrder.filter(_.startsWith("float"))
    candidates.find { d =>
      val (dlo, dhi) = DtypeRange(d)
      val nodata = DtypeNodata(d)
      lo >= dlo && hi <= dhi && (nodata.isNaN || hi < nodata)
    }.map(d => (d, DtypeNodata(d))).getOrElse(("float64", Double.NaN))
  }
}
