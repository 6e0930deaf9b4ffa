package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Integer vector kernels ([[graft.ops.IntVecKernel]]) and the
  * oracle-exact embedding near-dup twin (q23): md5-weight contract,
  * codegen/interpreted agreement, BigInt-reference exactness, overflow
  * bound on the shipped testdata, and planted-pair recovery.
  */
class IntVecSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("md5 hyperplane weights match the SQL-replayable derivation") {
    // contract: w = +1 iff integer value of first 7 md5 hex chars is odd
    // (DuckDB: CAST(('0x' || substr(md5(s),1,7)) AS BIGINT) % 2)
    val w = graft.ops.IntVecKernel.weights(table = 2, bits = 16, dim = 64)
    for (b <- Seq(0, 7, 15); d <- Seq(0, 31, 63)) {
      val v = java.lang.Long.parseLong(md5Hex(s"rhp:2:$b:$d").take(7), 16)
      val expected = if (v % 2 == 1) 1 else -1
      assert(w(b * 64 + d) == expected, s"weight (2,$b,$d)")
    }
    // memoization returns the same array instance
    assert(graft.ops.IntVecKernel.weights(2, 16, 64) eq w)
  }

  test("IntDotProduct / IntL2Squared match BigInt reference, codegen on and off") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextInt(1201) - 600).toLong),
        Array.fill(64)((rnd.nextInt(1201) - 600).toLong))
    }
    val df = rows.toDF("id", "a", "b")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        df.select(col("id"),
            Bridge.column(graft.ops.IntDotProduct(
              Bridge.expression(col("a")), Bridge.expression(col("b")))).as("dot"),
            Bridge.column(graft.ops.IntL2Squared(
              Bridge.expression(col("a")), Bridge.expression(col("b")))).as("l2"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    rows.foreach { case (id, a, b) =>
      val dot = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val l2 = a.zip(b).map { case (x, y) => (BigInt(x) - BigInt(y)).pow(2) }.sum
      assert(dot.isValidLong && l2.isValidLong)
      assert(gen(id) == (dot.toLong, l2.toLong), s"codegen row $id")
      assert(interp(id) == (dot.toLong, l2.toLong), s"interpreted row $id")
    }
  }

  test("IntL2Squared over integer-valued float arrays is exact") {
    val rows = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(16)(d => ((i * 31 + d * 7) % 1009 - 504).toFloat),
        Array.tabulate(16)(d => ((i * 17 + d * 13) % 1009 - 504).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        Bridge.column(graft.ops.IntL2Squared(
          Bridge.expression(col("a")), Bridge.expression(col("b")))).as("l2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, a, b) =>
      val exp = a.zip(b).map { case (x, y) =>
        val d = x.toLong - y.toLong; d * d }.sum
      assert(got(id) == exp, s"row $id")
    }
  }

  test("MdIntRhpSign matches a per-row Scala replay and is codegen-stable") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 30).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextInt(1201) - 600).toLong)))
    val df = rows.toDF("id", "q")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(col("id"), Bridge.column(graft.ops.MdIntRhpSign(
          Bridge.expression(col("q")), bits = 16, table = 1)).as("k"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    assert(run("NO_CODEGEN") == gen)
    rows.foreach { case (id, q) =>
      var key = 0L
      for (b <- 0 until 16) {
        val s = (0 until 64).map { d =>
          val v = java.lang.Long.parseLong(md5Hex(s"rhp:1:$b:$d").take(7), 16)
          val w = if (v % 2 == 1) 1L else -1L
          w * q(d)
        }.sum
        if (s >= 0) key |= (1L << b)
      }
      assert(gen(id) == key, s"row $id")
    }
  }

  test("q23 twin: overflow bound holds and planted pairs are recovered on testdata") {
    val emb = spark.read.parquet(s"$sf0/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // overflow audit: num^2 * thrDen^2 and thrNum^2 * n2a * n2b must fit
    // Long — bound max |floor(x*1000)| on the shipped data (incl. the
    // 1.01 perturbation margin) and check dim * m^2 leaves headroom
    val m = emb.select(max(abs(floor(element_at(col("embedding"), 1)
        .cast("double") * 1010)))).as[Long].head()
    val dim = 64L
    val numMax = BigInt(dim) * BigInt(m + 10) * BigInt(m + 10)
    assert((numMax * numMax * 400).isValidLong,
      s"refine predicate would overflow Long at m=$m")
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, (x.cast("double") * 1.01).cast("float")).otherwise(x))
          .as("embedding"))
    val out = graft.ops.Dedup.embeddingNearDupIntMd5(
        emb.unionByName(planted), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every reported pair is a planted twin with cos_ppm >= 950000 ...
    out.foreach { case (a, b, ppm) =>
      assert(b == a + 100000L, s"unexpected pair ($a,$b)")
      assert(ppm >= 950000L && ppm <= 1000000L, s"ppm $ppm")
    }
    // ... and LSH recovers nearly all of the 20 planted pairs (each
    // collides in >= 1 of 4 tables with overwhelming probability)
    assert(out.length >= 18, s"only ${out.length} of 20 planted pairs found")
  }
}
