package graft

import graft.ops.{Categorize, Dedup, KnnJoin}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-3 scale-shape gates: the shuffle-payload properties that decide
  * whether the wide-key paths survive a 100x scale-up, pinned as tests so
  * a refactor can't silently reintroduce them, plus exact-equivalence
  * checks for the rewritten kernels.
  */
class ScaleShapeSpec extends SparkSpec {

  import spark.implicits._

  // ---------- categorize: narrow join-back ---------------------------

  test("q38 plan: no (h1,h2) join exchange carries the raw text column") {
    val p = SparkEntry.queries("q38_highcard_codes")(spark, sf0)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // Formatted detail blocks: "(n) Exchange" followed by Input/Arguments.
    val blocks = p.split("\n\n").filter(_.trim.nonEmpty)
    val exchanges = blocks.filter(
      _.trim.linesIterator.toSeq.headOption.exists(_.matches("""\(\d+\) Exchange.*""")))
    assert(exchanges.nonEmpty, "no Exchange blocks found in formatted plan")
    val joinKeyExchanges = exchanges.filter(_.contains("hashpartitioning(__h1__"))
    assert(joinKeyExchanges.nonEmpty, "expected surrogate-key join exchanges")
    joinKeyExchanges.foreach { b =>
      assert(!b.contains("text#"),
        s"surrogate-key exchange still ships document text:\n$b")
    }
    // The fact table never shuffles text. The ONLY text-bearing
    // exchanges allowed are the dictionary build's inherent rank
    // shuffles — O(distinct values), not O(corpus): the range exchange
    // over distinct values and the __pid__-keyed window exchange (both
    // now visible in the plan because the dict is an evictable persist()
    // rather than a lineage-truncating checkpoint; the bytes moved are
    // identical, and the byte-ratio test below measures them).
    val textExchanges = exchanges.filter(_.contains("text#"))
    // Scope the exemption to the DICTIONARY subtree, not to partitioning
    // kind alone: the dict build's inputs are post-distinct — its
    // exchanges carry only the distinct value (+ __pid__), never a fact
    // attribute. A corpus-sized text-bearing shuffle necessarily carries
    // the fact id (doc_id) alongside the text, so requiring the absence
    // of doc_id# keeps the gate armed against a future regression that
    // happens to range- or __pid__-partition the fact table.
    val dictBuild = (b: String) =>
      (b.contains("hashpartitioning(__pid__") || b.contains("rangepartitioning(")) &&
        !b.contains("doc_id#")
    val factTextExchanges = textExchanges.filterNot(dictBuild)
    assert(factTextExchanges.isEmpty,
      s"corpus-sized text-bearing exchanges leaked into the join-back plan:\n${factTextExchanges.mkString("\n---\n")}")
  }

  test("categorize hash join-back equals broadcast join-back (nulls, dups)") {
    val df = Seq(Some("pear"), Some("apple"), None, Some("pear"),
      Some("fig"), None, Some("apple")).toDF("fruit")
      .withColumn("row_id", monotonically_increasing_id())
    val viaHash = Categorize.categorizeColumnPlan(df, "fruit", "code",
      hintBroadcast = false)
    val viaBroadcast = Categorize.categorizeColumnPlan(df, "fruit", "code",
      hintBroadcast = true)
    assertSameRows(
      viaHash.select("row_id", "fruit", "code"),
      viaBroadcast.select("row_id", "fruit", "code"))
    // null values stay null-coded in the hash path too
    assert(viaHash.filter(col("fruit").isNull && col("code").isNotNull).count() == 0)
  }

  test("categorize join-back: surrogate keys shuffle far fewer bytes than raw-text join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // near-unique ~1 KB HIGH-ENTROPY texts (shuffle bytes are measured
      // post-compression, so repetitive filler would understate the raw
      // path; real web text is closer to this than to repeated lorem)
      val docs = spark.range(3000).map { j =>
        val i = j.toLong
        val sb = new StringBuilder(1100)
        var k = 0
        while (k < 64) {
          sb.append(java.lang.Long.toHexString(
            graft.input.WebTable.splitmix64(i * 8191L + k)))
          sb.append(' ')
          k += 1
        }
        (i, sb.toString)
      }.toDF("doc_id", "text").localCheckpoint(true)
      val slim = Categorize.categorizeColumnPlan(docs, "text", "code",
          hintBroadcast = false).select("doc_id", "code")
      // round-2 formulation: dictionary joins back on the raw string
      val wide = {
        val codes = Categorize.denseCodes(docs, "text", "code")
        docs.join(codes, Seq("text"), "left").select("doc_id", "code")
      }
      assertSameRows(slim, wide)
      val slimBytes = shuffleBytes { slim.write.format("noop").mode("overwrite").save() }
      val wideBytes = shuffleBytes { wide.write.format("noop").mode("overwrite").save() }
      info(f"shuffle bytes: slim=$slimBytes%,d wide=$wideBytes%,d (${wideBytes.toDouble / slimBytes}%.1fx)")
      assert(slimBytes * 2 < wideBytes,
        s"surrogate-key join-back should shuffle <1/2 the bytes: slim=$slimBytes wide=$wideBytes")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ---------- embedding near-dup: ids-only bucket shuffle -------------

  /** Sum of shuffle-write bytes across all tasks while `f` runs. */
  private def shuffleBytes(f: => Unit): Long = {
    @volatile var bytes = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes += t.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      // listener bus is async; settle until the counter stops moving
      var prev = -1L
      var spins = 0
      while (bytes != prev && spins < 40) { prev = bytes; Thread.sleep(100); spins += 1 }
      bytes
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** The round-2 formulation: both vectors ride the bucket self-join and
    * the cross-table union — kept here as the shuffle-bytes baseline the
    * slim path must beat.
    */
  private def wideNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int, tables: Int): DataFrame = {
    val base = df.select(col(idCol).as("__id__"), col(vecCol).as("__v__"))
    val candidates = (0 until tables).map { t =>
      val sigs = base.withColumn("__key__", Dedup.rhp_sign(col("__v__"), bits, 1000L + t))
      val l = sigs.select(col("__id__").as("a"), col("__v__").as("va"), col("__key__"))
      val r = sigs.select(col("__id__").as("b"), col("__v__").as("vb"), col("__key__"))
      l.join(r, Seq("__key__")).filter(col("a") < col("b"))
        .select(col("a"), col("b"), col("va"), col("vb"))
    }.reduce(_ unionByName _).dropDuplicates("a", "b")
    candidates
      .withColumn("cosine", Dedup.cosineCol(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }

  private def embCorpus(n: Int, dim: Int): DataFrame =
    spark.range(n.toLong).map { j =>
      val i = j.toLong
      val base = Array.tabulate(dim) { d =>
        val h = graft.input.WebTable.splitmix64(i / 2 * 7919L + d)
        (java.lang.Long.remainderUnsigned(h, 2000L) / 1000.0f) - 1.0f
      }
      // odd ids are small perturbations of the preceding even id
      if (i % 2 == 1) base(0) = base(0) * 1.01f
      (i, base)
    }.toDF("vec_id", "embedding")

  test("embeddingNearDup: ids-only shuffle matches wide results with far fewer bytes") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpus = embCorpus(2000, 64).localCheckpoint(true)
      val slim = Dedup.embeddingNearDup(corpus, "vec_id", "embedding", 0.95)
      val wide = wideNearDup(corpus, "vec_id", "embedding", 0.95, bits = 16, tables = 4)
      assertSameRows(slim, wide)
      assert(slim.count() >= 900, "planted near-dup pairs should be found")
      val slimBytes = shuffleBytes { slim.write.format("noop").mode("overwrite").save() }
      val wideBytes = shuffleBytes { wide.write.format("noop").mode("overwrite").save() }
      info(f"shuffle bytes: slim=$slimBytes%,d wide=$wideBytes%,d (${wideBytes.toDouble / slimBytes}%.1fx)")
      assert(slimBytes * 2 < wideBytes,
        s"ids-only path should shuffle <1/2 the bytes: slim=$slimBytes wide=$wideBytes")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("RandomHyperplaneSign: cached weight matrix emits the original per-row keys") {
    val corpus = embCorpus(64, 48)
    val got = corpus.select(col("vec_id"),
      Dedup.rhp_sign(col("embedding"), 16, 1003L).as("key"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference recompute: the pre-cache per-row formula, verbatim
    corpus.collect().foreach { r =>
      val v = r.getSeq[Float](1)
      var key = 0L
      (0 until 16).foreach { b =>
        var dot = 0.0
        v.indices.foreach { d =>
          val h = graft.input.WebTable.splitmix64(1003L * 1000003L + b * 131071L + d)
          dot += ((java.lang.Long.remainderUnsigned(h, 1000000L) / 1000000.0) - 0.5) * v(d)
        }
        if (dot >= 0) key |= (1L << b)
      }
      assert(got(r.getLong(0)) == key, s"vec ${r.getLong(0)} sign key drifted")
    }
  }

  test("CosineSim: unequal-length arrays yield null, equal-length exact") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b").withColumn("cos", Dedup.cosineCol(col("a"), col("b")))
    val rows = df.select("cos").collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0), "length mismatch must be null, not a prefix cosine")
  }

  // ---------- kNN histogram guard --------------------------------------

  test("knnAdaptive at fine resolution falls back to the ring loop (no driver histogram)") {
    // resolution=100 m => ~91M grid cells: collecting the histogram would
    // be a driver OOM at scale. Points clustered within ~2 km so the ring
    // fallback resolves quickly.
    val data = spark.range(200).select(
      col("id").as("pid"),
      (lit(100000.0) + (col("id") % 40) * 97.0).as("x"),
      (lit(200000.0) + (col("id") % 53) * 89.0).as("y"))
    val qs = spark.range(5).select(
      col("id").as("qid"),
      (lit(100500.0) + col("id") * 31.0).as("qx"),
      (lit(201000.0) + col("id") * 57.0).as("qy"))
    val got = KnnJoin.knnAdaptive(qs, "qid", "qx", "qy",
      data, "pid", "x", "y", k = 3, resolution = 100L)
    // brute-force oracle
    val exp = qs.crossJoin(data)
      .withColumn("dist2", (col("x") - col("qx")) * (col("x") - col("qx")) +
        (col("y") - col("qy")) * (col("y") - col("qy")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("dist2"), col("pid"))))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("pid"), col("dist2"), col("rank"))
    assertSameRows(got.withColumn("rank", col("rank").cast("int")), exp)
  }

  // ---------- CosineSim codegen compile gate ---------------------------

  test("CosineSim codegen compiles against NON-nullable inputs (no interpreter fallback)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.ArrayData
    // Non-nullable children used to make `nullable` resolve to false
    // while the kernel can still return null on a length mismatch —
    // the generated isNull slot became the constant `false` and the
    // projection failed to COMPILE, silently dropping the whole
    // projection to interpreter mode. GenerateUnsafeProjection.generate
    // throws on a compile error, so this gate fails loudly.
    val expr = graft.ops.CosineSim(
      BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = false),
      BoundReference(1, ArrayType(FloatType, containsNull = false), nullable = false))
    val proj = GenerateUnsafeProjection.generate(Seq(expr), false)
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.0f, 0.0f)), ArrayData.toArrayData(Array(1.0f, 0.0f)))
    assert(math.abs(proj(row).getDouble(0) - 1.0) < 1e-12)
    // length mismatch -> null, and the declared nullability admits it
    assert(expr.nullable)
    val mism = InternalRow(
      ArrayData.toArrayData(Array(1.0f, 0.0f)), ArrayData.toArrayData(Array(1.0f)))
    assert(proj(mism).isNullAt(0))
  }
}
