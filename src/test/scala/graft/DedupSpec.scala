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

  test("embeddingNearDupSkewSafe: identical-vector mega cluster collapses to one representative") {
    def vec(i: Long, bump: Int = -1): Array[Float] =
      Array.tabulate(16) { d =>
        val h = graft.input.WebTable.splitmix64(i * 31L + d)
        val v = (java.lang.Long.remainderUnsigned(h, 2000L) / 1000.0f) - 1.0f
        if (d == bump) v + 0.01f else v
      }
    // 5k bit-identical copies of vector 0 (boilerplate pages all embed
    // the same) + 40 distinct + 8 planted near-dups of distinct vectors
    val boiler = (0L until 5000L).map(j => (100000L + j, vec(0L)))
    val base = (0L until 40L).map(i => (i, vec(i)))
    val near = (0L until 8L).map(j => (200000L + j, vec(j, bump = 3)))
    val df = (boiler ++ base ++ near).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupSkewSafe(df, "vec_id", "embedding",
        threshold = 0.99, bucketCap = 64)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // the 5000-copy cluster is ONE representative (vec_id 0, the global
    // min over identical vectors) — zero intra-cluster pairs in the output
    assert(!got.exists { case (a, b) => a >= 100000L && a < 200000L ||
      b >= 100000L && b < 200000L }, "exact duplicates must be collapsed, not paired")
    // near-dups of representatives still found
    (0L until 8L).foreach { j =>
      assert(got.contains((j, 200000L + j)), s"missed planted near-dup $j")
    }
  }

  test("skew-safe near-dup: planted 10k-identical cluster stays linear, recall survives the cap") {
    // A boilerplate mega-cluster: 10,000 copies of one page on top of the
    // normal corpus. Uncapped LSH would self-join the cluster's bucket
    // into ~5*10^7 pairs; the exact pre-pass collapses it to ONE
    // representative, and the bucket cap bounds anything residual.
    val boiler = corpus.head._2
    val cluster = (0L until 10000L).map(j => (10000L + j, boiler))
    val df = (corpus ++ cluster).toDF("doc_id", "text").repartition(32)
    val got = Dedup.minhashDedupSkewSafe(df, "doc_id", "text",
        threshold = 0.6, bucketCap = 16)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    // Linearity: output pairs bounded by the distinct-text pair count —
    // nothing quadratic in the cluster size leaked through.
    assert(got.length < 200, s"cluster went quadratic: ${got.length} pairs")
    // Soundness under the cap: every pair is truly over threshold.
    val oracle = bruteJaccard(3)
    got.foreach { case (a, b, j) =>
      assert(math.abs(oracle((a, b)) - j) < 1e-12 && j >= 0.6)
    }
    // Recall under the cap: representatives are min-id per text, so the
    // planted near-dup pairs (base j, 200+j) must still surface.
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    val planted = (0L until 30L).map(j => (j, 200L + j))
      .filter { case (a, b) => oracle((a, b)) >= 0.6 }
    planted.foreach(p => assert(gotPairs.contains(p), s"cap dropped true pair $p"))
  }

  test("bucket cap bounds candidate fan-out deterministically") {
    // All docs identical => every (band,bucket) holds all ids; with cap c
    // the candidate pairs per band are exactly c*(c-1)/2 over the SAME
    // (lowest) ids at any parallelism.
    val df = (0L until 500L).map(i => (i, "same text every time"))
      .toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(df, "doc_id", "text", bucketCap = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(cands == (for { a <- 0L until 8L; b <- 0L until 8L if a < b }
      yield (a, b)).toSet)
  }

  test("md5-simhash banding is pigeonhole-exact (equals all-pairs Hamming join)") {
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.simhashPairsSig(df, "doc_id",
        Dedup.simhash_md5_60(col("text")), bits = 60, chunks = 4, maxHamming = 3)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect()
    def sig(t: String): Long =
      graft.ops.SimHashMd5(org.apache.spark.sql.catalyst.expressions.Literal(t))
        .eval(null).asInstanceOf[Long]
    val sigOf = corpus.map { case (id, t) => id -> sig(t) }.toMap
    val allPairs = (for {
      (ida, _) <- corpus; (idb, _) <- corpus if ida < idb
      h = java.lang.Long.bitCount(sigOf(ida) ^ sigOf(idb)) if h <= 3
    } yield (ida, idb, h)).toSet
    assert(got.toSet == allPairs)
    assert(allPairs.nonEmpty, "fixture degenerate: no close simhash pairs")
  }

  test("exact dedup groups identical content") {
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
    assert(got.count() == corpus.size - 10) // 10 exact dups collapse
    assert(got.filter(col("n") === 2).count() == 10)
  }

  test("crossCorpusNearDup finds planted contamination, never within-side pairs") {
    val all = corpus.toDF("doc_id", "text")
    val train = all.filter(col("doc_id") % 2 === 0)
    // test side: fresh ids, half planted from train texts (the leak)
    val trainTexts = corpus.filter(_._1 % 2 == 0)
    val test = (0 until 20).map { i =>
      val id = 9000L + i
      if (i % 2 == 0) (id, trainTexts(i)._2) // contaminated
      else (id, s"unique holdout text number $i with no overlap at all")
    }.toDF("doc_id", "text")
    val got = graft.ops.Dedup.crossCorpusNearDup(
        train, "doc_id", test, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    // every planted (J=1) pair found; sides correct
    val found = got.map(p => (p._1, p._2)).toSet
    (0 until 20 by 2).foreach { i =>
      assert(found.contains((trainTexts(i)._1, 9000L + i)),
        s"planted leak $i missed")
    }
    got.foreach { case (a, b, j) =>
      assert(a % 2 == 0 && b >= 9000L, s"pair ($a,$b) crosses wrong sides")
      assert(j >= 0.8)
    }
    // clean holdout rows never flagged
    assert(got.forall(p => p._2 % 2 == 0 || p._2 < 9000L + 20))
    assert(!got.exists(p => (p._2 - 9000L) % 2 == 1))
  }

  // ---------------- connected components -------------------------------

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  test("components equals union-find on fuzzed random graphs") {
    (0 until 5).foreach { trial =>
      val edges = (0 until 60).map { i =>
        val h1 = graft.input.WebTable.splitmix64(trial * 1000L + i * 2L)
        val h2 = graft.input.WebTable.splitmix64(trial * 1000L + i * 2L + 1L)
        (java.lang.Long.remainderUnsigned(h1, 40L),
          java.lang.Long.remainderUnsigned(h2, 40L))
      }
      val got = graft.ops.ConnectedComponents
        .components(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(40, edges), s"trial $trial")
    }
  }

  test("components converges on a long chain (diameter-bound topology)") {
    val edges = (0L until 30L).map(i => (i, i + 1))
    val got = graft.ops.ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect()
    assert(got.length == 31 && got.forall(_._2 == 0L))
  }

  test("components frees superseded checkpoints: bounded pinned blocks after N rounds") {
    // Force several pointer-halving rounds with a long chain; without
    // the per-round Pinned.free, every superseded label table (plus sym)
    // would stay in getPersistentRDDs for the life of the session.
    val preFree = spark.sparkContext.getPersistentRDDs.keySet
    val edges = (0L until 60L).map(i => (i, i + 1))
    val out = graft.ops.ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b")
    assert(out.count() == 61)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- preFree
    // exactly the fixpoint label table may remain pinned (it backs the
    // returned frame); sym + all superseded iterations must be gone
    assert(leaked.size <= 1,
      s"expected <=1 surviving pinned RDD (the fixpoint), got ${leaked.size}")
  }

  test("clusterRepresentatives composes with minhash pairs: one keeper per cluster") {
    val df = corpus.toDF("doc_id", "text")
    val pairs = Dedup.minhashDedup(df, "doc_id", "text", threshold = 0.6)
    val reps = graft.ops.ConnectedComponents
      .clusterRepresentatives(pairs, "a", "b")
      .as[(Long, Long, Boolean)].collect()
    // exactly one keeper per component, and it is the min member
    reps.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.count(_._3) == 1, s"component $comp keeper count")
      assert(members.filter(_._3).head._1 == members.map(_._1).min)
      assert(comp == members.map(_._1).min)
    }
  }
}
