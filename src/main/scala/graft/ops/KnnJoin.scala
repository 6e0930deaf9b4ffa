package graft.ops

import graft.index.IndexExpressions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN join via BNG cell-ring expansion (graft operator J6).
  *
  * For each query point, candidates are gathered from square rings of
  * cells around the query's cell, ring radius growing until the kth
  * candidate's true distance is provably inside the searched radius
  * (kth_dist <= ring_inner_radius guarantees no unseen cell can beat it:
  * any point in an unvisited cell is at least `ring * res` away).
  *
  * Implementation is fully declarative: queries explode to their ring-r
  * cell lists, equi-join on cell against the data side, and a window
  * row_number ranks by exact distance. The loop over r happens on the
  * driver but each iteration only joins the NOT-yet-finished queries —
  * at scale the first ring resolves almost every query (cells are sized
  * so E[points per cell] >> k), so later iterations touch a vanishing
  * fraction. Ties broken deterministically by (dist2, dataId).
  */
object KnnJoin {

  /** @param queries DataFrame with (qId, qx, qy)
    * @param data    DataFrame with (dataId, x, y)
    * @param k       neighbours per query
    * @param resolution BNG cell size in metres
    * @param maxRing safety bound on ring expansion
    * @return columns (qId, dataId, dist2, rank) — dist2 = squared
    *         euclidean distance (exact in integer-valued coordinates)
    */
  def knn(
      queries: DataFrame, qId: String, qx: String, qy: String,
      data: DataFrame, dataId: String, x: String, y: String,
      k: Int, resolution: Long = 10000L, maxRing: Int = 256): DataFrame = {

    val spark = queries.sparkSession
    val dataCells = data
      .withColumn("__cell__", bng_index_point(col(x), col(y), resolution))
      .select(col(dataId), col(x), col(y), col("__cell__"))

    val qBase = queries
      .withColumn("__qcell__", bng_index_point(col(qx), col(qy), resolution))
      .select(col(qId), col(qx), col(qy), col("__qcell__"))

    var pending = qBase
    var resolved: DataFrame = null
    var ring = 0
    // Accumulated candidates per pending query (re-fed each round so rank
    // is over everything seen so far).
    var candidates: DataFrame = null

    while (ring <= maxRing && !pending.isEmpty) {
      val ringCells = pending
        .withColumn("__cell__", explode(cell_ring(col("__qcell__"), lit(ring))))
      val newCand = ringCells.join(dataCells, Seq("__cell__")).drop("__cell__")
      candidates = if (candidates == null) newCand else candidates.unionByName(newCand)
      candidates = candidates.localCheckpoint(true)

      val w = Window.partitionBy(col(qId))
        .orderBy(col("__dist2__"), col(dataId))
      val ranked = candidates
        .withColumn("__dist2__",
          (col(x) - col(qx)) * (col(x) - col(qx)) +
          (col(y) - col(qy)) * (col(y) - col(qy)))
        .withColumn("__rank__", row_number().over(w))
        .filter(col("__rank__") <= k)

      // A query is finished when it has k neighbours and the kth distance
      // fits inside the ring's guaranteed-covered radius — any point in an
      // unvisited cell (Chebyshev ring >= ring+1) is >= ring*res away.
      // Once the rings cover the whole canvas, everything pending is done.
      val coveredAll =
        ring >= (math.max(graft.core.Constants.BngXMax,
          graft.core.Constants.BngYMax) / resolution + 1)
      val guaranteed = (ring.toLong * resolution).toDouble
      val kth =
        if (coveredAll) pending.select(col(qId).as("__doneq__"))
        else ranked.groupBy(col(qId))
          .agg(count(lit(1)).as("__n__"), max(sqrt(col("__dist2__"))).as("__kd__"))
          .filter(col("__n__") === k && col("__kd__") <= guaranteed)
          .select(col(qId).as("__doneq__"))

      val done = ranked.join(broadcast(kth), col(qId) === col("__doneq__"))
        .drop("__doneq__")
      resolved = if (resolved == null) done else resolved.unionByName(done)
      pending = pending.join(broadcast(kth), col(qId) === col("__doneq__"), "left_anti")
      pending = pending.localCheckpoint(true)
      candidates = candidates.join(broadcast(kth), col(qId) === col("__doneq__"), "left_anti")
      ring += 1
    }
    val out = resolved
    out.select(col(qId), col(dataId), col("__dist2__").as("dist2"),
      col("__rank__").as("rank"))
  }

  /** Adaptive-radius kNN: the scale-path variant. The per-ring driver loop
    * of [[knn]] costs one Spark job per ring; this plans each query's ring
    * radius up front from a per-cell count histogram and resolves
    * everything in ONE candidate join + window, with an exact-bound
    * verification and brute-force fallback for the (rare) queries whose
    * kth neighbour lies beyond the planned radius.
    *
    * The histogram is bounded by the GRID (<= 9,100 cells at 10 km over
    * the BNG canvas), not the data — broadcastable at any data scale.
    * Plan: rings until cumulative count >= k, then x sqrt(2) slack so the
    * guarantee bound (unvisited cells >= R*res away) usually holds on the
    * first pass.
    */
  /** Ceiling on the driver-collected histogram: the grid cell count at
    * the requested resolution. 10 km => ~9.1k cells (the design point);
    * 1 km => ~910k (still a few MB, allowed); 100 m => ~91M cells, which
    * would OOM the driver — such calls fall back to [[knn]]'s ring loop,
    * whose driver state is O(1) regardless of resolution.
    */
  val MaxHistogramCells: Long = 4000000L

  def knnAdaptive(
      queries: DataFrame, qId: String, qx: String, qy: String,
      data: DataFrame, dataId: String, x: String, y: String,
      k: Int, resolution: Long = 10000L): DataFrame = {
    val gridCells = (graft.core.Constants.BngXMax / resolution + 1) *
      (graft.core.Constants.BngYMax / resolution + 1)
    if (gridCells > MaxHistogramCells)
      return knn(queries, qId, qx, qy, data, dataId, x, y, k, resolution)
    val spark = queries.sparkSession
    val dataCells = data
      .withColumn("__cell__", bng_index_point(col(x), col(y), resolution))
      .select(col(dataId), col(x), col(y), col("__cell__"))

    // cell histogram: tiny (bounded by grid size), map-side combined
    val counts: Map[Long, Long] = dataCells
      .groupBy(col("__cell__")).count()
      .collect().map { r =>
        val (e, n, res) = graft.index.Bng.parse(r.getString(0))
        (e / res) * 1000000L + (n / res) -> r.getLong(1)
      }.toMap
    val bcCounts = spark.sparkContext.broadcast(counts)
    val maxRing = (math.max(graft.core.Constants.BngXMax,
      graft.core.Constants.BngYMax) / resolution + 1).toInt

    val ringNeeded = udf { (qcell: String) =>
      val (e, n, res) = graft.index.Bng.parse(qcell)
      val eIdx = e / res; val nIdx = n / res
      val maxE = graft.core.Constants.BngXMax / res - 1
      val maxN = graft.core.Constants.BngYMax / res - 1
      var cum = 0L
      var r = 0
      var rNeed = -1
      while (rNeed < 0 && r <= maxRing) {
        // ring r cell count sum
        var de = -r
        while (de <= r) {
          var dn = -r
          while (dn <= r) {
            if (math.max(math.abs(de), math.abs(dn)) == r) {
              val ee = eIdx + de; val nn = nIdx + dn
              if (ee >= 0 && ee <= maxE && nn >= 0 && nn <= maxN)
                cum += bcCounts.value.getOrElse(ee * 1000000L + nn, 0L)
            }
            dn += 1
          }
          de += 1
        }
        if (cum >= k) rNeed = r
        r += 1
      }
      if (rNeed < 0) maxRing
      else math.min(maxRing, math.ceil((rNeed + 1) * math.sqrt(2.0)).toInt)
    }

    val qPlanned = queries
      .withColumn("__qcell__", bng_index_point(col(qx), col(qy), resolution))
      .withColumn("__R__", ringNeeded(col("__qcell__")))

    val candidates = qPlanned
      .withColumn("__r__", explode(sequence(lit(0), col("__R__"))))
      .withColumn("__cell__", explode(cell_ring(col("__qcell__"), col("__r__"))))
      .join(dataCells, Seq("__cell__"))
      .withColumn("__dist2__",
        (col(x) - col(qx)) * (col(x) - col(qx)) +
        (col(y) - col(qy)) * (col(y) - col(qy)))
    val w = Window.partitionBy(col(qId)).orderBy(col("__dist2__"), col(dataId))
    val ranked = candidates
      .withColumn("__rank__", row_number().over(w))
      .filter(col("__rank__") <= k)
      .localCheckpoint(true)

    // exact-bound verification: kth distance must be within R*res
    val status = ranked.groupBy(col(qId))
      .agg(count(lit(1)).as("__n__"),
        max(sqrt(col("__dist2__"))).as("__kd__"),
        first(col("__R__")).as("__R0__"))
      .withColumn("__ok__",
        col("__n__") === k && col("__kd__") <= col("__R0__") * resolution)
    // checkpointed: one row per OK query, consumed by TWO broadcast
    // builds (the resolved join and the failed anti-join) plus the
    // isEmpty probe — materialize the aggregation once instead of per
    // consumer (round 7)
    val okQ = status.filter(col("__ok__")).select(col(qId).as("__okq__"))
      .localCheckpoint(true)

    val resolvedOk = ranked.join(broadcast(okQ), col(qId) === col("__okq__"))
      .select(col(qId), col(dataId), col("__dist2__").as("dist2"),
        col("__rank__").as("rank"))

    val failed = qPlanned.join(broadcast(okQ), col(qId) === col("__okq__"), "left_anti")
      .select(col(qId), col(qx), col(qy))
    if (failed.isEmpty) resolvedOk
    else resolvedOk.unionByName(
      knnBroadcast(failed, qId, qx, qy, data, dataId, x, y, k))
  }

  /** Simple exact kNN for small query sets: broadcast queries, one pass
    * over data, window top-k. The right plan when |queries| is small enough
    * to broadcast — no ring iteration, one shuffle of candidate pairs
    * pre-filtered by a radius bound if given.
    */
  def knnBroadcast(
      queries: DataFrame, qId: String, qx: String, qy: String,
      data: DataFrame, dataId: String, x: String, y: String,
      k: Int): DataFrame = {
    val pairs = data.crossJoin(broadcast(queries))
      .withColumn("dist2",
        (col(x) - col(qx)) * (col(x) - col(qx)) +
        (col(y) - col(qy)) * (col(y) - col(qy)))
    val w = Window.partitionBy(col(qId)).orderBy(col("dist2"), col(dataId))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(dataId), col("dist2"), col("rank"))
  }
}
