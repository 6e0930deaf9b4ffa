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
    val (face, step, iMin, iMax, jMin, jMax) = ijBounds(minx, miny, maxx, maxy, level)
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

  /** Converged (face, step, iMin, iMax, jMin, jMax) of an envelope's
    * image in the face ij grid (shared by both covers).
    */
  private def ijBounds(minx: Double, miny: Double, maxx: Double, maxy: Double,
      level: Int): (Int, Int, Int, Int, Int, Int) = {
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
    (face, step, iMin, iMax, jMin, jMax)
  }

  /** Mean Earth radius used by every spherical-distance surface in the
    * engine (matches H3.edgeMetres' sphere).
    */
  val EarthRadiusMetres: Double = 6371000.0

  /** Unit vector of (latDeg, lngDeg). */
  def latLngToXyz(latDeg: Double, lngDeg: Double): (Double, Double, Double) = {
    val phi = math.toRadians(latDeg)
    val theta = math.toRadians(lngDeg)
    val cosPhi = math.cos(phi)
    (math.cos(theta) * cosPhi, math.sin(theta) * cosPhi, math.sin(phi))
  }

  /** Angle (radians) between two unit vectors — atan2 form, stable for
    * both near-parallel and near-antipodal pairs.
    */
  def angleBetween(a: (Double, Double, Double), b: (Double, Double, Double)): Double = {
    val dot = a._1 * b._1 + a._2 * b._2 + a._3 * b._3
    val cx = a._2 * b._3 - a._3 * b._2
    val cy = a._3 * b._1 - a._1 * b._3
    val cz = a._1 * b._2 - a._2 * b._1
    math.atan2(math.sqrt(cx * cx + cy * cy + cz * cz), dot)
  }

  /** Cells at `level` covering the spherical cap of `radiusMetres` around
    * (latDeg, lngDeg) — SEAM-SAFE: hierarchical subdivision from the six
    * face cells working purely in unit-vector space, so caps spanning the
    * antimeridian, the poles, or any face boundary are covered correctly
    * (no face-local (i,j) arithmetic ever crosses an edge).
    *
    * Conservative-superset guarantee: a cell is kept iff
    * angle(cellCenter, capCenter) <= capAngle + cellCircumradius, where
    * the circumradius is the exact max center-to-corner geodesic (S2
    * cells are convex spherical quads, so the farthest cell point from
    * the center is a corner). Every cell intersecting the cap satisfies
    * this, so no candidate is ever missed; the slack only admits a thin
    * extra ring.
    */
  def coverCap(latDeg: Double, lngDeg: Double, radiusMetres: Double,
      level: Int): Seq[Long] = {
    require(level >= 0 && level <= MaxLevel, s"bad level $level")
    require(radiusMetres >= 0, "negative radius")
    val cap = latLngToXyz(latDeg, lngDeg)
    val capAngle = radiusMetres / EarthRadiusMetres
    val leafSpan = 1 << MaxLevel
    val out = Seq.newBuilder[Long]
    def unitAt(face: Int, i: Double, j: Double): (Double, Double, Double) = {
      val u = stToUV(i / leafSpan)
      val v = stToUV(j / leafSpan)
      val (x, y, z) = faceUVToXYZ(face, u, v)
      val n = math.sqrt(x * x + y * y + z * z)
      (x / n, y / n, z / n)
    }
    def recurse(face: Int, i0: Int, j0: Int, size: Int, lvl: Int): Unit = {
      val ctr = unitAt(face, i0 + size * 0.5, j0 + size * 0.5)
      val circum = Seq((i0, j0), (i0 + size, j0), (i0, j0 + size),
        (i0 + size, j0 + size))
        .map { case (ii, jj) => angleBetween(unitAt(face, ii, jj), ctr) }.max
      if (angleBetween(ctr, cap) <= capAngle + circum * 1.0000001) {
        if (lvl == level) out += parent(fromFaceIJ(face, i0, j0), level)
        else {
          val h = size >> 1
          recurse(face, i0, j0, h, lvl + 1)
          recurse(face, i0 + h, j0, h, lvl + 1)
          recurse(face, i0, j0 + h, h, lvl + 1)
          recurse(face, i0 + h, j0 + h, h, lvl + 1)
        }
      }
    }
    (0 until 6).foreach(f => recurse(f, 0, 0, leafSpan, 0))
    out.result()
  }

  /** (face, u, v) -> unit vector (inverse of [[xyzToFaceUV]]). */
  def faceUVToXYZ(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  /** BNG (e, n) of the point at leaf-grid fractional (i, j) on `face`. */
  private def ijToBng(face: Int, i: Double, j: Double): (Double, Double) = {
    val u = stToUV(i / (1 << MaxLevel))
    val v = stToUV(j / (1 << MaxLevel))
    val (x, y, z) = faceUVToXYZ(face, u, v)
    val lat = math.toDegrees(math.atan2(z, math.hypot(x, y)))
    val lng = math.toDegrees(math.atan2(y, x))
    Transform.wgs84ToBng(lat, lng)
  }

  /** Cells at `level` covering a GEOMETRY (conservative superset, tighter
    * than the envelope cover for thin/non-convex shapes): the same ij
    * walk, but a cell is kept only when the geometry comes within that
    * cell's own center-to-corner radius (projected to BNG metres, exact
    * per cell) of its center. Any geometry point inside the cell is
    * within that radius of the center, so containment is preserved; far
    * interior-void cells of the bounding box are pruned.
    */
  def coverGeometryBng(geom: org.locationtech.jts.geom.Geometry,
      level: Int): Seq[Long] = {
    val env = geom.getEnvelopeInternal
    val (face, step, iMin, iMax, jMin, jMax) =
      ijBounds(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, level)
    val gf = geom.getFactory
    val out = Seq.newBuilder[Long]
    var i = iMin & -step
    while (i <= iMax) {
      var j = jMin & -step
      while (j <= jMax) {
        val (cx, cy) = ijToBng(face, i + 0.5 * step, j + 0.5 * step)
        var radius = 0.0
        var ci = 0
        while (ci < 4) {
          val (ex, ey) = ijToBng(face,
            i + (if ((ci & 1) == 0) 0.0 else step.toDouble),
            j + (if ((ci & 2) == 0) 0.0 else step.toDouble))
          radius = math.max(radius, math.hypot(ex - cx, ey - cy))
          ci += 1
        }
        val center = gf.createPoint(new org.locationtech.jts.geom.Coordinate(cx, cy))
        if (geom.isWithinDistance(center, radius * 1.05))
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
