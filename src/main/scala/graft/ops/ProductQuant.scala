package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Product-quantization ANN (public design: Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011): the
  * memory-bound scale path for web-corpus embeddings. The vector space
  * splits into M subspaces; each subspace gets its own K-centroid
  * codebook; a vector encodes to M small codes (M bytes at K<=256) —
  * 16-64x compression — and query-to-code distances are computed by
  * table lookup (ADC), never touching the original floats.
  *
  * Scale shape:
  *  - training: per-subspace Lloyd, either on a driver sample or fully
  *    distributed (one explode + one aggregation per iteration; driver
  *    traffic is the M x K x dsub codebook matrix only);
  *  - encoding: ONE full-corpus scan through a row-local Catalyst
  *    expression; the codebook rides the serialized plan (few KB);
  *    encoded corpus persists at M bytes/vector — the asset that makes
  *    10^12-vector search fit a cluster's memory;
  *  - search: the per-query M x K lookup table is built ONCE driver-side
  *    (queries are few and broadcast by contract, like bruteForceTopK);
  *    the scan does M byte-indexed adds per candidate, no float vector
  *    access. ADC distance identity ||q - decode(codes)||^2 is pinned in
  *    SimilaritySpec; recall measured against brute force.
  */
object ProductQuant {

  /** codebooks(m)(k)(d): M sub-codebooks, K centroids each, trained with
    * the same deterministic sampled-Lloyd loop as
    * [[Similarity.trainCentroids]], independently per subspace.
    * Vector dim must be divisible by M.
    */
  def trainCodebooks(corpus: DataFrame, id: String, vec: String,
      m: Int, k: Int, iters: Int = 5, sampleN: Int = 2048): Array[Array[Array[Double]]] = {
    val sample = corpus.orderBy(col(id)).limit(sampleN)
      .select(col(vec)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    (0 until m).toArray.map { mi =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub))
      val stride = math.max(1, sub.length / k)
      var centroids = (0 until k).map(i =>
        sub(math.min(i * stride, sub.length - 1))).toArray
      (0 until iters).foreach { _ =>
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Int](k)
        sub.foreach { v =>
          val c = nearestSub(v, centroids)
          counts(c) += 1
          var d = 0
          while (d < dsub) { sums(c)(d) += v(d); d += 1 }
        }
        centroids = centroids.indices.map { c =>
          if (counts(c) == 0) centroids(c) else sums(c).map(_ / counts(c))
        }.toArray
      }
      centroids
    }
  }

  /** Distributed per-subspace Lloyd: one explode (M rows per vector:
    * subspace index + subvector slice) + ONE aggregation per iteration
    * computing per-(subspace, code) member counts and dsub-dim sums —
    * map-side combined, so the 10^12-row path moves only the
    * M x K x dsub codebook matrix to the driver per iteration.
    */
  def trainCodebooksDistributed(corpus: DataFrame, id: String, vec: String,
      m: Int, k: Int, iters: Int = 3): Array[Array[Array[Double]]] = {
    val dim = corpus.select(size(col(vec))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    // deterministic init: subvectors of the k smallest-id rows
    var codebooks: Array[Array[Array[Double]]] = {
      val init = corpus.orderBy(col(id)).limit(k).select(col(vec)).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      (0 until m).toArray.map { mi =>
        // pad by cycling if the corpus has fewer than k rows
        (0 until k).toArray.map(i =>
          java.util.Arrays.copyOfRange(init(i % init.length), mi * dsub, (mi + 1) * dsub))
      }
    }
    (0 until iters).foreach { _ =>
      val rows = corpus.select(
          posexplode(Bridge.column(PqAssignExpr(
            Bridge.expression(col(vec)), codebooks))).as(Seq("__m__", "__sub__")))
        .select(col("__m__"), col("__sub__.code").as("__code__"),
          col("__sub__.sub").as("__subv__"))
        .groupBy(col("__m__"), col("__code__"))
        .agg(count(lit(1)).as("__n__"),
          array((0 until dsub).map(d =>
            sum(element_at(col("__subv__"), d + 1).cast("double"))): _*).as("__s__"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      rows.foreach { r =>
        val mi = r.getInt(0); val c = r.getInt(1); val n = r.getLong(2)
        if (n > 0) next(mi)(c) = r.getSeq[Double](3).map(_ / n).toArray
      }
      codebooks = next
    }
    codebooks
  }

  /** Integer-quantized distributed Lloyd: same one-explode-one-agg
    * iteration shape as [[trainCodebooksDistributed]], but sums
    * accumulate as LONGs and the centroid update is a floor division —
    * so with integer-valued input vectors every quantity in training is
    * an integer. Two properties fall out: the distributed aggregation is
    * ORDER-INDEPENDENT (integer addition is associative; float Lloyd
    * means depend on partition reduce order), and an external SQL engine
    * can replicate training bit-for-bit — which is what puts the PQ
    * pipeline under an exact driver oracle (q54) instead of a rows-only
    * floor. Centroids return as integer-valued doubles so encode/ADC
    * reuse unchanged.
    */
  def trainCodebooksDistributedInt(corpus: DataFrame, id: String, vec: String,
      m: Int, k: Int, iters: Int = 1): Array[Array[Array[Double]]] = {
    val dim = corpus.select(size(col(vec))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    var codebooks: Array[Array[Array[Double]]] = {
      val init = corpus.orderBy(col(id)).limit(k).select(col(vec)).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      (0 until m).toArray.map { mi =>
        (0 until k).toArray.map(i =>
          java.util.Arrays.copyOfRange(init(i % init.length), mi * dsub, (mi + 1) * dsub))
      }
    }
    (0 until iters).foreach { _ =>
      val rows = corpus.select(
          posexplode(Bridge.column(PqAssignExpr(
            Bridge.expression(col(vec)), codebooks))).as(Seq("__m__", "__sub__")))
        .select(col("__m__"), col("__sub__.code").as("__code__"),
          col("__sub__.sub").as("__subv__"))
        .groupBy(col("__m__"), col("__code__"))
        .agg(count(lit(1)).as("__n__"),
          array((0 until dsub).map(d =>
            sum(element_at(col("__subv__"), d + 1).cast("long"))): _*).as("__s__"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      rows.foreach { r =>
        val mi = r.getInt(0); val c = r.getInt(1); val n = r.getLong(2)
        if (n > 0)
          next(mi)(c) = r.getSeq[Long](3).map(s => Math.floorDiv(s, n).toDouble).toArray
      }
      codebooks = next
    }
    codebooks
  }

  private[graft] def nearestSub(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d2 = 0.0; var d = 0
      val ctr = cs(c)
      val lim = math.min(v.length, ctr.length)
      while (d < lim) { val t = v(d) - ctr(d); d2 += t * t; d += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Corpus -> (idCol, codes binary): M bytes per vector. */
  def encode(corpus: DataFrame, id: String, vec: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    corpus.select(col(id),
      Bridge.column(PqEncodeExpr(Bridge.expression(col(vec)), codebooks))
        .as("codes"))

  /** ADC top-k: approximate squared-euclidean k nearest corpus codes per
    * query. `queries` is collected driver-side (few-query broadcast
    * contract, as [[Similarity.bruteForceTopK]]); per-query M x K lookup
    * tables ride the serialized plan. Returns (qid, id, adc_dist, rank).
    */
  def adcTopK(queries: DataFrame, qId: String, qVec: String,
      encodedCorpus: DataFrame, id: String, codesCol: String,
      codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val qs = queries.select(col(qId).cast("long"), col(qVec)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val luts: Map[Long, Array[Array[Double]]] = qs.map { case (qid, qv) =>
      qid -> codebooks.zipWithIndex.map { case (cb, mi) =>
        cb.map { ctr =>
          var d2 = 0.0; var d = 0
          while (d < dsub) { val t = qv(mi * dsub + d) - ctr(d); d2 += t * t; d += 1 }
          d2
        }
      }
    }.toMap
    require(m > 0 && luts.nonEmpty, "empty queries or codebooks")
    val qidDf = queries.sparkSession.createDataFrame(
      queries.sparkSession.sparkContext.parallelize(
        qs.map(q => org.apache.spark.sql.Row(q._1)).toSeq, 1),
      StructType(Seq(StructField("__qid__", LongType, nullable = false))))
    val pairs = encodedCorpus.crossJoin(broadcast(qidDf))
      .withColumn("adc_dist", Bridge.column(PqAdcExpr(
        Bridge.expression(col(codesCol)), Bridge.expression(col("__qid__")), luts)))
    val w = Window.partitionBy(col("__qid__"))
      .orderBy(col("adc_dist"), col(id))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid__").as(qId), col(id), col("adc_dist"), col("rank"))
  }

  /** ADC shortlist + EXACT re-rank — the standard production PQ shape:
    * the byte-code scan cannot rank inside a tight cluster (quantization
    * floor), so the top-`shortlist` ADC candidates per query re-rank by
    * exact squared-euclidean against their original vectors. Only the
    * shortlist (|queries| x shortlist rows) ever touches float vectors;
    * the corpus-wide scan stays byte-only. Returns (qid, id, dist2,
    * rank<=k).
    */
  def adcTopKReranked(queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, id: String, vec: String,
      codebooks: Array[Array[Array[Double]]], k: Int,
      shortlist: Int = 64, intDist: Boolean = false): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val encoded = encode(corpus, id, vec, codebooks)
    val cand = adcTopK(queries, qId, qVec, encoded, id, "codes",
        codebooks, shortlist)
      .select(col(qId), col(id))
    val qside = queries.select(col(qId), col(qVec))
    // `intDist`: vectors are integer-valued (the q54 oracle twin) — one
    // codegen'd exact-long kernel call per pair (IntL2Squared) instead
    // of the double aggregate(zip_with(...)) lambda chain. The double
    // path stays the default for real float embeddings, where integer
    // truncation would be wrong.
    val exact = cand
      .join(corpus.select(col(id), col(vec)), Seq(id))
      .join(broadcast(qside), Seq(qId))
      .withColumn("dist2",
        if (intDist)
          Bridge.column(IntL2Squared(
            Bridge.expression(col(vec)), Bridge.expression(col(qVec))))
        else aggregate(
          zip_with(col(vec), col(qVec),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy(col(qId)).orderBy(col("dist2"), col(id))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(id), col("dist2"), col("rank"))
  }
}

/** vector -> array<struct<code:int, sub:array<float>>> of length M: each
  * subspace's assigned code plus the subvector slice (training's
  * aggregation input).
  */
case class PqAssignExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("code", IntegerType, nullable = false),
    StructField("sub", ArrayType(FloatType, containsNull = false), nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val sub = new Array[Double](dsub)
      val subF = new Array[Any](dsub)
      var d = 0
      while (d < dsub) {
        val x = arr.getFloat(mi * dsub + d)
        sub(d) = x; subF(d) = x
        d += 1
      }
      out(mi) = org.apache.spark.sql.catalyst.InternalRow(
        ProductQuant.nearestSub(sub, codebooks(mi)), new GenericArrayData(subF))
      mi += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** vector -> M-byte PQ code (binary). K must be <= 256. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebooks.forall(_.length <= 256), "PQ byte codes need K <= 256")
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val out = new Array[Byte](m)
    val sub = new Array[Double](dsub)
    var mi = 0
    while (mi < m) {
      var d = 0
      while (d < dsub) { sub(d) = arr.getFloat(mi * dsub + d); d += 1 }
      out(mi) = ProductQuant.nearestSub(sub, codebooks(mi)).toByte
      mi += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (codes binary, qid long) -> ADC distance: sum over subspaces of the
  * query's precomputed subspace-distance table entry for that code.
  */
case class PqAdcExpr(left: Expression, right: Expression,
    luts: Map[Long, Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(codes: Any, qid: Any): Any = {
    val lut = luts(qid.asInstanceOf[Long])
    val cs = codes.asInstanceOf[Array[Byte]]
    var acc = 0.0
    var mi = 0
    while (mi < cs.length) {
      acc += lut(mi)(cs(mi) & 0xff)
      mi += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
