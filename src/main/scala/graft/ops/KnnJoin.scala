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
