package graft.index

/** S2 cell ids from scratch, per the published S2 geometry specification:
  * lat/lng -> unit sphere -> cube face (u,v) -> quadratic (s,t) ->
  * leaf (i,j) -> 64-bit Hilbert-curve cell id. Bit-compatible with the
  * reference S2 libraries (same face numbering, same quadratic projection,
  * same lookup-table Hilbert traversal).
  */
object S2 {
  val MaxLevel = 30
  private val LookupBits = 4
  private val SwapMask = 1
  private val InvertMask = 2

  // Hilbert traversal order per orientation (published S2 constants).
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical
    Array(0, 2, 3, 1), // swap
    Array(3, 2, 0, 1), // invert
    Array(3, 1, 0, 2)) // swap + invert
  private val posToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)

  private val lookupPos = new Array[Int](1 << (2 * LookupBits + 2))
  private val lookupIJ = new Array[Int](1 << (2 * LookupBits + 2))

  private def initLookupCell(level: Int, i: Int, j: Int, origOrientation: Int,
      pos: Int, orientation: Int): Unit = {
    if (level == LookupBits) {
      val ij = (i << LookupBits) + j
      lookupPos((ij << 2) + origOrientation) = (pos << 2) + orientation
      lookupIJ((pos << 2) + origOrientation) = (ij << 2) + orientation
    } else {
      val r = posToIJ(orientation)
      var subPos = 0
      while (subPos < 4) {
        val ij = r(subPos)
        initLookupCell(level + 1, (i << 1) + (ij >> 1), (j << 1) + (ij & 1),
          origOrientation, (pos << 2) + subPos,
          orientation ^ posToOrientation(subPos))
        subPos += 1
      }
    }
  }
  initLookupCell(0, 0, 0, 0, 0, 0)
  initLookupCell(0, 0, 0, SwapMask, 0, SwapMask)
  initLookupCell(0, 0, 0, InvertMask, 0, InvertMask)
  initLookupCell(0, 0, 0, SwapMask | InvertMask, 0, SwapMask | InvertMask)

  /** Quadratic ST projection (the S2_QUADRATIC_PROJECTION default). */
  def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  def stToUV(s: Double): Double = {
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1)
    else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))
  }

  private def stToIJ(s: Double): Int =
    math.max(0, math.min((1 << MaxLevel) - 1, (s * (1 << MaxLevel)).floor.toInt))

  /** Unit vector -> (face, u, v). Face k is centered on +axis k (0=x, 1=y,
    * 2=z), faces 3-5 on the negative axes.
    */
  def xyzToFaceUV(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val face0 =
      if (ax > ay) { if (ax > az) 0 else 2 }
      else { if (ay > az) 1 else 2 }
    val face = face0 match {
      case 0 if x < 0 => 3
      case 1 if y < 0 => 4
      case 2 if z < 0 => 5
      case f => f
    }
    face match {
      case 0 => (0, y / x, z / x)
      case 1 => (1, -x / y, z / y)
      case 2 => (2, -x / z, -y / z)
      case 3 => (3, z / x, y / x)
      case 4 => (4, z / y, -x / y)
      case 5 => (5, -y / z, -x / z)
    }
  }

  /** Leaf cell id from (face, i, j) via the table-driven Hilbert curve. */
  def fromFaceIJ(face: Int, i: Int, j: Int): Long = {
    var n: Long = face.toLong << (2 * MaxLevel)
    var bits: Int = face & SwapMask
    var k = 7
    while (k >= 0) {
      val mask = (1 << LookupBits) - 1
      bits += ((i >> (k * LookupBits)) & mask) << (LookupBits + 2)
      bits += ((j >> (k * LookupBits)) & mask) << 2
      bits = lookupPos(bits)
      n |= (bits >> 2).toLong << (k * 2 * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    n * 2 + 1
  }

  def lsbForLevel(level: Int): Long = 1L << (2 * (MaxLevel - level))

  /** Cell id containing (lat, lng) degrees at `level`. */
  def cellId(latDeg: Double, lngDeg: Double, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"bad level $level")
    val phi = math.toRadians(latDeg)
    val theta = math.toRadians(lngDeg)
    val cosPhi = math.cos(phi)
    val x = math.cos(theta) * cosPhi
    val y = math.sin(theta) * cosPhi
    val z = math.sin(phi)
    val (face, u, v) = xyzToFaceUV(x, y, z)
    val i = stToIJ(uvToST(u))
    val j = stToIJ(uvToST(v))
    val leaf = fromFaceIJ(face, i, j)
    val lsb = lsbForLevel(level)
    (leaf & -lsb) | lsb
  }

  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  def face(id: Long): Int = (id >>> (2 * MaxLevel + 1)).toInt

  def parent(id: Long, level: Int): Long = {
    val lsb = lsbForLevel(level)
    (id & -lsb) | lsb
  }

  /** (latDeg, lngDeg) -> (face, leaf i, leaf j). */
  def faceIJ(latDeg: Double, lngDeg: Double): (Int, Int, Int) = {
    val phi = math.toRadians(latDeg)
    val theta = math.toRadians(lngDeg)
    val cosPhi = math.cos(phi)
    val (face, u, v) = xyzToFaceUV(
      math.cos(theta) * cosPhi, math.sin(theta) * cosPhi, math.sin(phi))
    (face, stToIJ(uvToST(u)), stToIJ(uvToST(v)))
  }

  /** Cells at `level` covering a BNG envelope (conservative superset).
    *
    * Valid because the BNG canvas lies entirely on one S2 face (face 2,
    * verified in H3S2Spec), where the (i, j) leaf grid is a plain square
    * grid. The image of the rectangle under TM-inverse + ST projection is
    * curved, and its ij extrema lie on the boundary — so sample the
    * boundary adaptively, DOUBLING the per-edge density until the ij
    * bounding box stops moving (the sagitta between adjacent samples is
    * then sub-converged), and pad one cover cell for the residue. A fixed
    * 3x3 sample under-covered large envelopes at fine levels, where the
    * curvature between corner samples exceeds a cell. Cross-face
    * envelopes are rejected (would need S2's face-adjacency tables).
    */
  def coverEnvelopeBng(minx: Double, miny: Double, maxx: Double, maxy: Double,
      level: Int): Seq[Long] = {
    def boundarySamples(nPerEdge: Int): Seq[(Int, Int, Int)] = {
      val ts = (0 to nPerEdge).map(_.toDouble / nPerEdge)
      val pts =
        ts.map(t => (minx + t * (maxx - minx), miny)) ++
        ts.map(t => (minx + t * (maxx - minx), maxy)) ++
        ts.map(t => (minx, miny + t * (maxy - miny))) ++
        ts.map(t => (maxx, miny + t * (maxy - miny)))
      pts.map { case (x, y) =>
        val (lat, lng) = Transform.bngToWgs84Deg(x, y)
        faceIJ(lat, lng)
      }
    }
    def bounds(s: Seq[(Int, Int, Int)]): (Int, Int, Int, Int) =
      (s.map(_._2).min, s.map(_._2).max, s.map(_._3).min, s.map(_._3).max)
    var n = 2
    var samples = boundarySamples(n)
    var b = bounds(samples)
    var converged = false
    while (!converged && n < 1024) {
      n *= 2
      val next = boundarySamples(n)
      val nb = bounds(next)
      converged = nb == b
      samples = next
      b = nb
    }
    val faces = samples.map(_._1).distinct
    require(faces.size == 1,
      s"envelope spans S2 faces $faces — cross-face covers unsupported")
    val face = faces.head
    val step = 1 << (MaxLevel - level)
    val iMin = math.max(0, (b._1 & -step) - step)
    val iMax = math.min((1 << MaxLevel) - 1, b._2 + step)
    val jMin = math.max(0, (b._3 & -step) - step)
    val jMax = math.min((1 << MaxLevel) - 1, b._4 + step)
    val out = Seq.newBuilder[Long]
    var i = iMin & -step
    while (i <= iMax) {
      var j = jMin & -step
      while (j <= jMax) {
        out += parent(fromFaceIJ(face, i, j), level)
        j += step
      }
      i += step
    }
    out.result().distinct
  }

  def isValid(id: Long): Boolean =
    id != 0 && face(id) < 6 &&
      (java.lang.Long.numberOfTrailingZeros(id) % 2 == 0)
}
