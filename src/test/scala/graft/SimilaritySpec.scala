package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Long): Array[Float] =
    Array.tabulate(16) { d =>
      val h = graft.input.WebTable.splitmix64(i * 131L + d * 7L)
      (java.lang.Long.remainderUnsigned(h, 2000L) / 1000.0f) - 1.0f
    }

  private lazy val corpus = (100L until 400L).map(i => (i, vec(i)))
  private lazy val queries = (0L until 8L).map(i => (i, vec(i)))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { d =>
      dot += a(d).toDouble * b(d); na += a(d).toDouble * a(d); nb += b(d).toDouble * b(d)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val oracleTopK: Map[Long, Seq[Long]] = queries.map { case (qid, qv) =>
    qid -> corpus.map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
  }.toMap

  test("bruteForceTopK matches scala oracle exactly") {
    val got = Similarity.bruteForceTopK(
        queries.toDF("qid", "qvec"), "qid", "qvec",
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 10)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got == oracleTopK)
  }

  test("ivfTopK achieves >= 70% recall@10 vs brute force") {
    val got = Similarity.ivfTopK(
        queries.toDF("qid", "qvec"), "qid", "qvec",
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 10,
        nlist = 8, nprobe = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = queries.map { case (qid, _) =>
      val truth = oracleTopK(qid).toSet
      got.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"IVF mean recall@10 = $mean")
  }

  test("distributed k-means training: IVF recall holds with full-corpus Lloyd") {
    val got = Similarity.ivfTopK(
        queries.toDF("qid", "qvec"), "qid", "qvec",
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 10,
        nlist = 8, nprobe = 4, distributedTraining = true)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = queries.map { case (qid, _) =>
      val truth = oracleTopK(qid).toSet
      got.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    assert(recalls.sum / recalls.size >= 0.7,
      s"distributed-trained IVF recall ${recalls.sum / recalls.size}")
  }

  // ---------------- product quantization -------------------------------

  /** Clustered fixture (PQ's operating regime): 8 cluster centers, small
    * per-point jitter — web embeddings cluster; uniform noise would
    * understate any quantizer.
    */
  private def clusteredVec(i: Long, dim: Int): Array[Float] = {
    val cluster = (i % 8).toInt
    Array.tabulate(dim) { d =>
      val base = (graft.input.WebTable.splitmix64(cluster * 997L + d) % 1000L) / 500.0f
      val jit = (graft.input.WebTable.splitmix64(i * 131L + d) % 100L) / 1000.0f
      base + jit
    }
  }

  test("PQ ADC distance equals exact distance to the DECODED vector (identity)") {
    val rows = (0L until 200L).map(i => (i, clusteredVec(i, 32)))
    val df = rows.toDF("vec_id", "embedding")
    val cb = graft.ops.ProductQuant.trainCodebooks(df, "vec_id", "embedding",
      m = 4, k = 8, sampleN = 200)
    val encoded = graft.ops.ProductQuant.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Array[Byte])].collect().toMap
    // codes are M bytes: the 8x compression at dim 32 is real
    assert(encoded.values.forall(_.length == 4))
    val queries = (0L until 3L).map(i => (i + 10000L, clusteredVec(i + 7L, 32)))
    val got = graft.ops.ProductQuant.adcTopK(
        queries.toDF("qid", "qvec"), "qid", "qvec",
        graft.ops.ProductQuant.encode(df, "vec_id", "embedding", cb),
        "vec_id", "codes", cb, k = 200)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (qid, id, adc, _) =>
      val qv = queries.find(_._1 == qid).get._2.map(_.toDouble)
      val codes = encoded(id)
      // decode: concatenated sub-centroids
      val dec = codes.zipWithIndex.flatMap { case (c, mi) => cb(mi)(c & 0xff) }
      var d2 = 0.0
      dec.indices.foreach { d => val t = qv(d) - dec(d); d2 += t * t }
      assert(math.abs(adc - d2) < 1e-6 * math.max(1.0, d2),
        s"ADC $adc != exact-to-decoded $d2 for qid=$qid id=$id")
    }
  }

  test("PQ recall@10: ADC shortlist alone is cluster-coarse; exact re-rank >= 90%") {
    val rows = (100L until 500L).map(i => (i, clusteredVec(i, 32)))
    val df = rows.toDF("vec_id", "embedding").localCheckpoint(true)
    val cb = graft.ops.ProductQuant.trainCodebooksDistributed(
      df, "vec_id", "embedding", m = 8, k = 16, iters = 3)
    val queries = (0L until 6L).map(i => (i, clusteredVec(i * 13L + 3L, 32)))
    val exact: Map[Long, Set[Long]] = queries.map { case (qid, qv) =>
      qid -> rows.map { case (id, v) =>
        var d2 = 0.0
        v.indices.foreach { d => val t = qv(d).toDouble - v(d); d2 += t * t }
        (id, d2)
      }.sortBy { case (id, d2) => (d2, id) }.take(10).map(_._1).toSet
    }.toMap
    def recallOf(m: Map[Long, Set[Long]]): Double =
      queries.map { case (qid, _) =>
        (m(qid) intersect exact(qid)).size.toDouble / 10.0
      }.sum / queries.size
    // pure ADC: the fixture's within-cluster jitter sits BELOW the
    // 16-centroid quantization resolution, so byte codes cannot rank
    // inside a cluster — recall floors well under 1 (this is inherent
    // to PQ, the published reason production systems re-rank)
    val adcOnly = graft.ops.ProductQuant.adcTopK(
        queries.toDF("qid", "qvec"), "qid", "qvec",
        graft.ops.ProductQuant.encode(df, "vec_id", "embedding", cb),
        "vec_id", "codes", cb, k = 10)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(recallOf(adcOnly) >= 0.2, s"ADC-only recall collapsed: ${recallOf(adcOnly)}")
    // shortlist + exact re-rank: the production shape recovers the
    // within-cluster ordering from the float vectors of the shortlist
    val reranked = graft.ops.ProductQuant.adcTopKReranked(
        queries.toDF("qid", "qvec"), "qid", "qvec",
        df, "vec_id", "embedding", cb, k = 10, shortlist = 64)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(recallOf(reranked) >= 0.9, s"re-ranked recall = ${recallOf(reranked)}")
  }

  test("PQ distributed and sampled trainers agree on assignment quality") {
    val rows = (0L until 300L).map(i => (i, clusteredVec(i, 32)))
    val df = rows.toDF("vec_id", "embedding").localCheckpoint(true)
    val cbS = graft.ops.ProductQuant.trainCodebooks(df, "vec_id", "embedding",
      m = 4, k = 8, iters = 3, sampleN = 300)
    val cbD = graft.ops.ProductQuant.trainCodebooksDistributed(
      df, "vec_id", "embedding", m = 4, k = 8, iters = 3)
    // same data, same init rule, full-sample vs distributed: identical
    // codebooks up to float-sum association — compare quantization error
    def qerr(cb: Array[Array[Array[Double]]]): Double =
      rows.map { case (_, v) =>
        val dv = v.map(_.toDouble)
        cb.zipWithIndex.map { case (sub, mi) =>
          val s = java.util.Arrays.copyOfRange(dv, mi * 8, mi * 8 + 8)
          val c = graft.ops.ProductQuant.nearestSub(s, sub)
          s.indices.map { d => val t = s(d) - sub(c)(d); t * t }.sum
        }.sum
      }.sum
    val (eS, eD) = (qerr(cbS), qerr(cbD))
    assert(math.abs(eS - eD) <= 0.05 * math.max(eS, eD),
      s"sampled-vs-distributed quantization error diverged: $eS vs $eD")
  }

  test("ivf results are sound: every returned cosine is correct") {
    val all = (corpus ++ queries).toMap
    val got = Similarity.ivfTopK(
        queries.toDF("qid", "qvec"), "qid", "qvec",
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 5,
        nlist = 8, nprobe = 2)
      .select("qid", "vec_id", "cosine").as[(Long, Long, Double)].collect()
    got.foreach { case (q, id, c) =>
      assert(math.abs(cos(all(q), all(id)) - c) < 1e-12)
    }
  }
}
