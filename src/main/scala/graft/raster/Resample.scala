package graft.raster

/** Raster resampling — the reference's OpenCV-backed `_resample_cell_size`
  * (`_raster.py:87-138`) rebuilt as pure-JVM kernels: nearest neighbour
  * for categorical bands, bilinear for continuous, plus shape
  * normalization onto a larger nodata-padded canvas
  * (`_raster.py:210-395`). Each tile resamples independently — mapped
  * over Dataset[Tile] with no shuffle (SURVEY.md §3.3).
  */
object Resample {

  /** Nearest-neighbour resample of a row-major (h x w) grid to
    * (dstH x dstW). Pixel-center sampling: src index =
    * floor((i + 0.5) * scale).
    */
  def nearest(src: Array[Double], w: Int, h: Int, dstW: Int, dstH: Int): Array[Double] = {
    val out = new Array[Double](dstW * dstH)
    val sx = w.toDouble / dstW
    val sy = h.toDouble / dstH
    var r = 0
    while (r < dstH) {
      val sr = math.min(h - 1, ((r + 0.5) * sy).toInt)
      var c = 0
      while (c < dstW) {
        val sc = math.min(w - 1, ((c + 0.5) * sx).toInt)
        out(r * dstW + c) = src(sr * w + sc)
        c += 1
      }
      r += 1
    }
    out
  }

  /** Bilinear resample with edge clamping (continuous bands). */
  def bilinear(src: Array[Double], w: Int, h: Int, dstW: Int, dstH: Int): Array[Double] = {
    val out = new Array[Double](dstW * dstH)
    val sx = w.toDouble / dstW
    val sy = h.toDouble / dstH
    var r = 0
    while (r < dstH) {
      val fy = (r + 0.5) * sy - 0.5
      val y0 = math.max(0, math.min(h - 1, math.floor(fy).toInt))
      val y1 = math.min(h - 1, y0 + 1)
      val wy = math.max(0.0, math.min(1.0, fy - y0))
      var c = 0
      while (c < dstW) {
        val fx = (c + 0.5) * sx - 0.5
        val x0 = math.max(0, math.min(w - 1, math.floor(fx).toInt))
        val x1 = math.min(w - 1, x0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        val top = src(y0 * w + x0) * (1 - wx) + src(y0 * w + x1) * wx
        val bot = src(y1 * w + x0) * (1 - wx) + src(y1 * w + x1) * wx
        out(r * dstW + c) = top * (1 - wy) + bot * wy
        c += 1
      }
      r += 1
    }
    out
  }

  /** Shape normalization (reference `_reshape_raster`): place a source
    * grid whose extent is [srcMinX, srcMaxY-based] into a destination
    * canvas of (dstW x dstH) at dstCell starting from (dstMinX, dstMaxY),
    * nodata-padding everything the source doesn't cover. The source is
    * first resampled to the destination cell size (nearest or bilinear).
    */
  def normalize(
      src: Array[Double], w: Int, h: Int,
      srcMinX: Double, srcMaxY: Double, srcCell: Double,
      dstMinX: Double, dstMaxY: Double, dstCell: Double,
      dstW: Int, dstH: Int, nodata: Double,
      categorical: Boolean): Array[Double] = {
    // resample source to destination cell size
    val rw = math.max(1, math.round(w * srcCell / dstCell).toInt)
    val rh = math.max(1, math.round(h * srcCell / dstCell).toInt)
    val res =
      if (rw == w && rh == h) src
      else if (categorical) nearest(src, w, h, rw, rh)
      else bilinear(src, w, h, rw, rh)
    // place into canvas
    val out = Array.fill(dstW * dstH)(nodata)
    val colOff = math.round((srcMinX - dstMinX) / dstCell).toInt
    val rowOff = math.round((dstMaxY - srcMaxY) / dstCell).toInt
    var r = 0
    while (r < rh) {
      val dr = r + rowOff
      if (dr >= 0 && dr < dstH) {
        var c = 0
        while (c < rw) {
          val dc = c + colOff
          if (dc >= 0 && dc < dstW) out(dr * dstW + dc) = res(r * rw + c)
          c += 1
        }
      }
      r += 1
    }
    out
  }
}
