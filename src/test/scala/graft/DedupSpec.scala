package graft

import graft.ops.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Near-dup dedup vs brute-force oracles on a corpus with planted
  * duplicates (deterministic fixture).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  /** 120 base docs + 30 near-duplicates (one word changed) + 10 exact. */
  private lazy val corpus: Seq[(Long, String)] = {
    def docFor(i: Long): String = {
      var r = graft.input.WebTable.splitmix64(i * 7919L)
      val sb = new StringBuilder
      (0 until 30).foreach { _ =>
        r = graft.input.WebTable.splitmix64(r)
        sb.append(words(java.lang.Long.remainderUnsigned(r, words.length.toLong).toInt))
        sb.append(' ')
      }
      sb.toString.trim
    }
    val base = (0L until 120L).map(i => (i, docFor(i)))
    val nearDups = (0L until 30L).map { j =>
      val (_, txt) = base(j.toInt)
      val toks = txt.split(' ')
      toks(5) = "CHANGED"
      (200L + j, toks.mkString(" "))
    }
    val exactDups = (0L until 10L).map(j => (300L + j, base(j.toInt)._2))
    base ++ nearDups ++ exactDups
  }

  private def bruteJaccard(w: Int): Map[(Long, Long), Double] =
    (for {
      (ida, ta) <- corpus
      (idb, tb) <- corpus
      if ida < idb
      sa = TextAnalysis.shingleHashes(ta, w).toSet
      sb = TextAnalysis.shingleHashes(tb, w).toSet
      if sa.nonEmpty || sb.nonEmpty
    } yield {
      val inter = sa.intersect(sb).size.toDouble
      (ida, idb) -> (if (sa.isEmpty && sb.isEmpty) 1.0
        else inter / (sa.size + sb.size - inter))
    }).toMap

  test("minhashDedup: sound (every returned pair is truly over threshold) and catches planted dups") {
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.minhashDedup(df, "doc_id", "text", threshold = 0.6)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    val oracle = bruteJaccard(3)
    // soundness: exact refine means every returned jaccard matches oracle
    got.foreach { case (a, b, j) =>
      assert(math.abs(oracle((a, b)) - j) < 1e-12)
      assert(j >= 0.6)
    }
    // completeness on planted pairs: all exact dups and near-dups found
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    (0L until 10L).foreach { j =>
      assert(gotPairs.contains((j, 300L + j)), s"missed exact dup $j")
    }
    val planted = (0L until 30L).map(j => (j, 200L + j))
      .filter { case (a, b) => oracle((a, b)) >= 0.6 }
    planted.foreach { p =>
      assert(gotPairs.contains(p), s"missed planted near-dup $p")
    }
    assert(planted.size >= 25, "fixture degenerate: near-dups not near")
  }

  test("simhashPairs: all returned pairs verified, planted exact dups found") {
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect()
    def sim(t: String): Long = {
      // recompute via the expression kernel for the oracle
      val e = graft.ops.SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(t))
      e.eval(null).asInstanceOf[Long]
    }
    val simOf = corpus.toMap
    got.foreach { case (a, b, h) =>
      val expected = java.lang.Long.bitCount(sim(simOf(a)) ^ sim(simOf(b)))
      assert(expected == h && h <= 3)
    }
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    (0L until 10L).foreach(j => assert(gotPairs.contains((j, 300L + j))))
  }

  test("embeddingNearDup: planted near-identical vectors found, cosines exact") {
    def vec(i: Long, bump: Int = -1): Array[Float] =
      Array.tabulate(16) { d =>
        val h = graft.input.WebTable.splitmix64(i * 31L + d)
        val v = (java.lang.Long.remainderUnsigned(h, 2000L) / 1000.0f) - 1.0f
        if (d == bump) v + 0.01f else v
      }
    val base = (0L until 60L).map(i => (i, vec(i)))
    val dups = (0L until 15L).map(j => (100L + j, vec(j, bump = 3)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDup(df, "vec_id", "embedding", threshold = 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    (0L until 15L).foreach { j =>
      assert(got.contains((j, 100L + j)), s"missed planted vector dup $j")
    }
    // soundness vs brute force
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until 16).foreach { d =>
        dot += a(d).toDouble * b(d); na += a(d).toDouble * a(d); nb += b(d).toDouble * b(d)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val all = (base ++ dups).toMap
    got.foreach { case (a, b) => assert(cos(all(a), all(b)) >= 0.99) }
  }

  test("exact dedup groups identical content") {
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
    assert(got.count() == corpus.size - 10) // 10 exact dups collapse
    assert(got.filter(col("n") === 2).count() == 10)
  }
}
