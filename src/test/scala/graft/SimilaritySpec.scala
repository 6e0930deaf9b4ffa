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
