package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Baseline: brute-force cosine top-k (broadcast queries, one scan of the
  * corpus, window top-k — exact, O(|corpus| x |queries|), the right plan
  * when queries are few).
  *
  * Scale path: IVF — k-means-lite coarse quantizer trained on a seeded
  * sample (driver-side tiny), corpus partitioned by nearest centroid
  * (one shuffle, reusable across queries), queries probe `nprobe` nearest
  * centroid lists only. At 10^12 rows the centroid assignment is the
  * only full scan; per-query cost drops by ~nlist/nprobe.
  */
object Similarity {

  /** Exact brute-force cosine top-k. queries: (qid, qvec); corpus:
    * (id, vec). Returns (qid, id, cosine, rank<=k).
    */
  def bruteForceTopK(queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    val pairs = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", Dedup.cosineCol(col(qVec), col(vec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cosine").desc, col(id))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(id), col("cosine"), col("rank"))
  }

  /** Train `nlist` centroids with a few Lloyd iterations on a sample.
    * Deterministic: sample = first `sampleN` rows by id order; init =
    * every (sampleN/nlist)-th sampled vector.
    */
  def trainCentroids(corpus: DataFrame, id: String, vec: String,
      nlist: Int, iters: Int = 5, sampleN: Int = 2048): Array[Array[Double]] = {
    val sample = corpus.orderBy(col(id)).limit(sampleN)
      .select(col(vec)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    val stride = math.max(1, sample.length / nlist)
    var centroids = (0 until nlist).map(i => sample(math.min(i * stride, sample.length - 1))).toArray
    (0 until iters).foreach { _ =>
      val sums = Array.fill(nlist)(new Array[Double](sample.head.length))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < v.length) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  private def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d2 = 0.0
      var d = 0
      while (d < v.length) { val t = v(d) - cs(c)(d); d2 += t * t; d += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Distributed Lloyd iterations: assignment + per-dimension mean run as
    * Spark aggregations over the FULL corpus (map-side combined; the only
    * driver traffic is the nlist x dim centroid matrix per iteration).
    * This is the 10^12-row training path; [[trainCentroids]] is the
    * driver-sample shortcut for small inputs.
    */
  def trainCentroidsDistributed(corpus: DataFrame, id: String, vec: String,
      nlist: Int, iters: Int = 3): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.functions._
    val dim = corpus.select(size(col(vec))).head().getInt(0)
    // deterministic init: the nlist rows with smallest ids
    var centroids: Array[Array[Double]] = corpus.orderBy(col(id)).limit(nlist)
      .select(col(vec)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (0 until iters).foreach { _ =>
      // per-centroid, per-dimension sums in ONE aggregation: sum the
      // vectors element-wise per cluster plus the member count. The
      // assignment is a Catalyst expression over the raw ArrayData (no
      // per-row Seq[Float] boxing) carrying the few-KB centroid matrix
      // in the serialized plan.
      val sums = corpus
        .withColumn("__c__",
          Bridge.column(NearestCentroidExpr(
            Bridge.expression(col(vec)), centroids)))
        .groupBy(col("__c__"))
        .agg(count(lit(1)).as("__n__"),
          array((0 until dim).map(d =>
            sum(element_at(col(vec), d + 1).cast("double"))): _*).as("__s__"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(1)
        if (n > 0) {
          val s = r.getSeq[Double](2)
          next(c) = s.map(_ / n).toArray
        }
      }
      centroids = next
    }
    centroids
  }

  /** Integer-quantized distributed Lloyd (IVF coarse quantizer twin of
    * [[ProductQuant.trainCodebooksDistributedInt]]): same one-aggregation
    * iteration as [[trainCentroidsDistributed]], but sums accumulate as
    * LONGs and the centroid update is a floor division. With
    * integer-valued input vectors the whole trainer is integer, so the
    * distributed aggregation is order-independent (integer addition is
    * associative) and an external SQL engine replicates training
    * bit-for-bit — what puts the IVF pipeline under an exact driver
    * oracle (q25). Centroids return as integer-valued doubles so the
    * assignment/probe expressions reuse unchanged.
    */
  def trainCentroidsDistributedInt(corpus: DataFrame, id: String, vec: String,
      nlist: Int, iters: Int = 1): Array[Array[Double]] = {
    val dim = corpus.select(size(col(vec))).head().getInt(0)
    var centroids: Array[Array[Double]] = corpus.orderBy(col(id)).limit(nlist)
      .select(col(vec)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (0 until iters).foreach { _ =>
      val sums = corpus
        .withColumn("__c__",
          Bridge.column(NearestCentroidExpr(
            Bridge.expression(col(vec)), centroids)))
        .groupBy(col("__c__"))
        .agg(count(lit(1)).as("__n__"),
          array((0 until dim).map(d =>
            sum(element_at(col(vec), d + 1).cast("long"))): _*).as("__s__"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(1)
        if (n > 0)
          next(c) = r.getSeq[Long](2).map(s => Math.floorDiv(s, n).toDouble).toArray
      }
      centroids = next
    }
    centroids
  }

  /** IVF top-k under SQUARED-L2 with the integer-Lloyd trainer: the
    * oracle-exact twin of [[ivfTopK]] — over integer-valued vectors every
    * quantity (training, assignment, probe order, ranking distance) is an
    * integer, so the full pipeline admits an exact external oracle. The
    * float-cosine path stays the production default. Returns (qid, id,
    * dist2, rank<=k).
    */
  def ivfTopKL2(queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, id: String, vec: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 1): DataFrame = {
    val centroids = trainCentroidsDistributedInt(corpus, id, vec, nlist, iters)
    val listed = corpus.withColumn("__list__",
      Bridge.column(NearestCentroidExpr(Bridge.expression(col(vec)), centroids)))
    val probed = queries.withColumn("__list__",
      explode(Bridge.column(NearestCentroidsExpr(
        Bridge.expression(col(qVec)), centroids, nprobe))))
    // exact integer L2 in ONE codegen'd kernel call per pair (round 5:
    // replaces the aggregate(zip_with(...)) chain — 2*dim lambda
    // evaluations plus a zipped ArrayData allocation per candidate)
    val pairs = listed.join(broadcast(probed), Seq("__list__"))
      .withColumn("dist2", Bridge.column(IntL2Squared(
        Bridge.expression(col(vec)), Bridge.expression(col(qVec)))))
    val w = Window.partitionBy(col(qId)).orderBy(col("dist2"), col(id))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(id), col("dist2"), col("rank"))
  }

  /** IVF ANN top-k: assign corpus to centroid lists, probe the `nprobe`
    * nearest lists per query. Returns same shape as bruteForceTopK (may
    * miss true neighbours outside probed lists — recall measured in
    * SimilaritySpec).
    */
  def ivfTopK(queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, id: String, vec: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      distributedTraining: Boolean = false): DataFrame = {
    val centroids =
      if (distributedTraining) trainCentroidsDistributed(corpus, id, vec, nlist)
      else trainCentroids(corpus, id, vec, nlist)

    // Assignment (the only full-corpus scan) and query probing as
    // Catalyst expressions over raw ArrayData — no per-row Seq[Float]
    // boxing; the few-KB centroid matrix rides the serialized plan.
    val listed = corpus.withColumn("__list__",
      Bridge.column(NearestCentroidExpr(Bridge.expression(col(vec)), centroids)))
    val probed = queries.withColumn("__list__",
      explode(Bridge.column(NearestCentroidsExpr(
        Bridge.expression(col(qVec)), centroids, nprobe))))
    val pairs = listed.join(broadcast(probed), Seq("__list__"))
      .withColumn("cosine", Dedup.cosineCol(col(qVec), col(vec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cosine").desc, col(id))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(id), col("cosine"), col("rank"))
  }
}

/** float vector -> index of the nearest centroid (squared-euclidean,
  * ties by lowest index — same argmin order as the driver-side trainer).
  */
case class NearestCentroidExpr(child: Expression,
    centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d2 = 0.0
      var d = 0
      val lim = math.min(n, ctr.length)
      while (d < lim) {
        val t = arr.getFloat(d) - ctr(d)
        d2 += t * t
        d += 1
      }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** float vector -> the `nprobe` nearest centroid indices ordered by
  * (distance, index) — the query-side probe list.
  */
case class NearestCentroidsExpr(child: Expression,
    centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val d2s = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d2 = 0.0
      var d = 0
      val lim = math.min(n, ctr.length)
      while (d < lim) {
        val t = arr.getFloat(d) - ctr(d)
        d2 += t * t
        d += 1
      }
      d2s(c) = d2
      c += 1
    }
    val order = d2s.indices.sortBy(i => (d2s(i), i)).take(nprobe)
    new GenericArrayData(order.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
