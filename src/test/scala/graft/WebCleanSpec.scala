package graft

import graft.ops.{BloomDedup, LineDedup}
import graft.text.WebClean
import org.apache.spark.sql.functions._

/** Training-data cleaning passes: repetition signals, URL
  * canonicalization, PII scrubbing, corpus line dedup, Bloom incremental
  * dedup. Each pinned against a brute-force oracle; LineDedup's
  * collision-residual path is force-exercised with a degenerate hash.
  */
class WebCleanSpec extends SparkSpec {

  import spark.implicits._

  private def rnd(i: Long, salt: Long): Double = {
    val x = graft.input.WebTable.splitmix64(i * 1315423911L + salt)
    (x >>> 11).toDouble / (1L << 53).toDouble
  }

  // ---------------- repetition signals --------------------------------

  private def naiveRepetition(text: String): (Long, Long, Long, Long) = {
    val toks = text.split(" ", -1)
    val top = toks.groupBy(identity).values.map(_.length).max.toLong
    val g2 = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    val g3 = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    (toks.length.toLong, top,
      (g2.length - g2.distinct.length).toLong,
      (g3.length - g3.distinct.length).toLong)
  }

  test("repetitionCounts equals naive oracle on random word soup") {
    val vocab = Array("a", "bb", "ccc", "dd", "e", "ffff", "g", "hh")
    (0 until 60).foreach { d =>
      val n = 1 + (rnd(d, 1) * 40).toInt
      val text = (0 until n).map(i => vocab((rnd(d * 100 + i, 2) * 8).toInt)).mkString(" ")
      assert(WebClean.repetitionCounts(text) == naiveRepetition(text), s"text=$text")
    }
  }

  test("repetitionCounts edge cases: empty tokens, single word, full repetition") {
    // "a  b" -> tokens (a, "", b) — string_split semantics keep empties
    assert(WebClean.repetitionCounts("a  b") == (3L, 1L, 0L, 0L))
    assert(WebClean.repetitionCounts("x") == (1L, 1L, 0L, 0L))
    // "y y y y": 3 bigrams all "y y" -> 2 dups; 2 trigrams -> 1 dup
    assert(WebClean.repetitionCounts("y y y y") == (4L, 4L, 2L, 1L))
    assert(WebClean.repetitionCounts("") == (1L, 1L, 0L, 0L))
  }

  // ---------------- URL canonicalization ------------------------------

  test("canonicalizeUrl: RFC 3986 normalization table") {
    val cases = Seq(
      "HTTPS://WWW.Example.COM:443/A/B/?b=2&a=1#frag" -> "https://example.com/A/B?a=1&b=2",
      "http://Example.com:80/" -> "http://example.com",
      "http://example.com:8080/x" -> "http://example.com:8080/x",
      "https://www.a.org" -> "https://a.org",
      "https://a.org/" -> "https://a.org",
      "https://a.org/x/" -> "https://a.org/x",
      "https://a.org/?z=1" -> "https://a.org?z=1",
      "ftp://Host.Net/Dir/" -> "ftp://host.net/Dir",
      // duplicate param names keep relative order (stable sort)
      "https://a.org/p?k=2&k=1&a=9" -> "https://a.org/p?a=9&k=2&k=1",
      "https://user:Pw@WWW.B.com/x" -> "https://user:Pw@b.com/x",
      "no-scheme-at-all" -> "no-scheme-at-all",
      "https://a.org/x#only-frag" -> "https://a.org/x",
      // bracketed IPv6: internal colons are not the port separator
      "https://[2001:DB8::1]:443/x/" -> "https://[2001:db8::1]/x",
      "http://[::1]:8080/y" -> "http://[::1]:8080/y",
      "http://[::1]/z" -> "http://[::1]/z")
    cases.foreach { case (in, want) =>
      assert(WebClean.canonicalizeUrl(in) == want, s"in=$in")
    }
  }

  test("canonicalizeUrl is idempotent on fuzzed URLs") {
    val schemes = Array("http", "HTTPS", "ftp")
    val hosts = Array("WWW.A-b.COM", "x.org", "www.w3.org", "Host.NET:8080",
      "site.io:443", "u:p@www.q.com")
    val paths = Array("", "/", "/A/b/", "/x", "/x/y/z/")
    val queries = Array("", "?b=2&a=1", "?k=2&k=1&j=0", "?single")
    val frags = Array("", "#f", "#a/b?c")
    for (s <- schemes; h <- hosts; p <- paths; q <- queries; f <- frags) {
      val u = s"$s://$h$p$q$f"
      val once = WebClean.canonicalizeUrl(u)
      assert(WebClean.canonicalizeUrl(once) == once,
        s"not idempotent: $u -> $once -> ${WebClean.canonicalizeUrl(once)}")
    }
  }

  // ---------------- PII scrub ----------------------------------------

  test("scrubPii replaces emails, IPs, phones with counts") {
    val (s, e, ip, ph) = WebClean.scrubPii(
      "mail a.b+c@sub.ex.org or x@y.co, host 10.0.200.3, dial 555-123-4567 twice 555-000-1111")
    assert(s == "mail <EMAIL> or <EMAIL>, host <IP>, dial <PHONE> twice <PHONE>")
    assert((e, ip, ph) == (2L, 1L, 2L))
  }

  test("scrubPii: email pass runs before IP pass (dotted hosts not half-eaten)") {
    val (s, e, ip, ph) = WebClean.scrubPii("ping 1.2.3.4 then a@1.2.3.4.net done")
    // the email regex consumes its own dotted host; the standalone IP is
    // still caught by the IP pass
    assert(s == "ping <IP> then <EMAIL> done")
    assert((e, ip, ph) == (1L, 1L, 0L))
    val none = WebClean.scrubPii("plain text, no pii at all")
    assert(none == ("plain text, no pii at all", 0L, 0L, 0L))
  }

  // ---------------- corpus line dedup ---------------------------------

  private def lineFixture = {
    // heavy duplication: 400 lines drawn from ~40 distinct strings
    val rows = (0 until 400).map { i =>
      val doc = i / 8L
      val lineNo = (i % 8).toLong
      val line = s"boiler ${(rnd(i, 7) * 40).toInt} plate"
      (doc, lineNo, line)
    }
    rows.toDF("doc_id", "line_no", "line")
  }

  private def bruteKept(lines: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("line").orderBy("doc_id", "line_no")
    lines.withColumn("__r__", row_number().over(w)).filter(col("__r__") === 1)
      .select("doc_id", "line_no", "line")
  }

  test("dedupLines equals brute-force first-occurrence dedup") {
    val lines = lineFixture
    assertSameRows(
      LineDedup.dedupLines(lines, "doc_id", "line_no", "line"),
      bruteKept(lines))
  }

  test("dedupLines collision-residual path is exact (degenerate hash forces it)") {
    val lines = lineFixture
    // constant h1/h2: every row collides into ONE bucket, so all rows of
    // every non-winner text flow through the residual exact pass — if
    // that pass is wrong, this diverges from brute force
    val got = LineDedup.dedupLinesImpl(lines, "doc_id", "line_no", "line",
      _ => lit(0L), _ => lit(0L))
    assertSameRows(got, bruteKept(lines))
  }

  test("dedupLines keeps null lines verbatim") {
    val lines = Seq((0L, 0L, "a"), (0L, 1L, null), (1L, 0L, "a"), (1L, 1L, null))
      .toDF("doc_id", "line_no", "line")
    val got = LineDedup.dedupLines(lines, "doc_id", "line_no", "line")
    assertSameRows(got,
      Seq((0L, 0L, "a"), (0L, 1L, null), (1L, 1L, null)).toDF("doc_id", "line_no", "line"))
  }

  test("dedupLines plan: winner aggregate exchange carries no line text") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = LineDedup.dedupLines(lineFixture, "doc_id", "line_no", "line")
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val blocks = p.split("\n\n").filter(_.trim.nonEmpty)
      val exchanges = blocks.filter(
        _.trim.linesIterator.toSeq.headOption.exists(_.matches("""\(\d+\) Exchange.*""")))
      val hashKeyed = exchanges.filter(_.contains("hashpartitioning(__h1__"))
      assert(hashKeyed.nonEmpty, "expected surrogate-key exchanges")
      // the winner aggregate's exchange must be narrow (hashes+position)
      assert(hashKeyed.exists(!_.contains("line#")),
        s"no narrow winner-agg exchange found:\n${hashKeyed.mkString("\n---\n")}")
      // text rides at most one hash-keyed exchange (the tag-join probe)
      assert(hashKeyed.count(_.contains("line#")) <= 1,
        s"line text leaked into extra hash-keyed exchanges:\n${hashKeyed.mkString("\n---\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("web-clean kernels compile under codegen against non-nullable input") {
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.StringType
    val in = BoundReference(0, StringType, nullable = false)
    val exprs = Seq(graft.text.RepetitionSignals(in), graft.text.PiiScrub(in),
      graft.text.UrlCanon(in), graft.text.WordCountsExpr(in))
    // generate() throws on a codegen compile error — no silent
    // interpreter fallback can hide a broken doGenCode
    val proj = GenerateUnsafeProjection.generate(exprs, false)
    val row = proj(InternalRow(UTF8String.fromString("a b a mail x@y.io https://www.z.org/p/")))
    assert(row.getStruct(0, 4).getLong(0) == 6L) // n_words (incl pii text)
    assert(row.getStruct(1, 4).getLong(1) == 1L) // n_email
  }

  // ---------------- TF-IDF --------------------------------------------

  test("wordCounts equals naive token counting, sorted by word") {
    val wc = WebClean.wordCounts("b a b  c a b").toSeq
    assert(wc == Seq(("", 1L), ("a", 2L), ("b", 3L), ("c", 1L)))
    assert(WebClean.wordCounts("x").toSeq == Seq(("x", 1L)))
  }

  test("TfIdf.topTerms equals brute-force scored oracle") {
    val docs = (0 until 40).map { d =>
      val vocab = Array("spark", "data", "the", "a", "corpus", "query", "join", "scan")
      val n = 5 + (rnd(d, 11) * 20).toInt
      (d.toLong, (0 until n).map(i => vocab((rnd(d * 50 + i, 12) * 8).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.text.TfIdf.topTerms(docs, "doc_id", "text", 3)
    // brute force in Scala
    val rows = docs.as[(Long, String)].collect()
    val n = rows.length.toLong
    val tf = rows.flatMap { case (d, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, g) => (d, w, g.length.toLong) }
    }
    val dfm = tf.groupBy(_._2).map { case (w, g) => (w, g.length.toLong) }
    val exp = tf.map { case (d, w, f) =>
      (d, w, f, dfm(w), f * math.floor(1000000.0 * n / dfm(w)).toLong)
    }.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (_, w, _, _, s) => (-s, w) }.take(3).zipWithIndex
        .map { case ((d, w, f, df2, _), i) => (d, w, f, df2, (i + 1).toLong) }
    }
    assertSameRows(got,
      exp.toDF("doc_id", "word", "tf", "df", "rank"))
  }

  // ---------------- packing + sampling ---------------------------------

  test("packSequences equals a sequential concat-then-chunk scan") {
    val docs = (0L until 300L).map(i => (i, 1L + (rnd(i, 21) * 400).toLong))
      .toDF("doc_id", "n_tokens")
    val got = graft.ops.Pack.packSequences(docs, "doc_id", "n_tokens", budget = 512L)
      .select("doc_id", "n_tokens", "start_offset", "pack_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    var off = 0L
    val exp = (0L until 300L).map { i =>
      val t = 1L + (rnd(i, 21) * 400).toLong
      val r = (i, t, off, off / 512L)
      off += t
      r
    }
    assert(got.toSeq == exp)
  }

  test("packSequences plan has no single-partition exchange") {
    val docs = (0L until 300L).map(i => (i, 1L + (rnd(i, 21) * 400).toLong))
      .toDF("doc_id", "n_tokens")
    val p = graft.ops.Pack.packSequences(docs, "doc_id", "n_tokens", 512L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"),
      s"global-sort window leaked into the packing plan:\n$p")
  }

  test("sampleAndSplit: deterministic, rate-respecting, split fractions hold") {
    val docs = (0L until 4000L).map(i => (i, s"s${i % 3}")).toDF("id", "dom")
    val rates = Seq(("s0", 0.5), ("s1", 1.0), ("s2", 0.1)).toDF("dom", "rate")
    val uniform = ((col("id") * 2654435761L) % 1000000L) / lit(1000000.0)
    val got = graft.ops.Pack.sampleAndSplit(docs, uniform, "dom", rates, "rate")
      .select("id", "dom", "split").as[(Long, String, String)].collect()
    // determinism under different partitioning
    val again = graft.ops.Pack.sampleAndSplit(docs.repartition(7), uniform,
        "dom", rates, "rate")
      .select("id", "dom", "split").as[(Long, String, String)].collect()
    assert(got.toSet == again.toSet)
    val byDom = got.groupBy(_._2).view.mapValues(_.length).toMap
    // ~0.5 / 1.0 / 0.1 of ~1333 each
    assert(math.abs(byDom("s0") - 667) < 80, byDom.toString)
    assert(byDom("s1") > 1300)
    assert(math.abs(byDom("s2") - 133) < 50)
    // split fractions are rate-independent (rescaled uniform)
    Seq("s0", "s1", "s2").foreach { d =>
      val rows = got.filter(_._2 == d)
      val test = rows.count(_._3 == "test").toDouble / rows.length
      assert(math.abs(test - 0.05) < 0.04, s"$d test frac $test")
    }
  }

  // ---------------- Bloom incremental dedup ---------------------------

  test("BloomDedup.newDocs equals plain anti-join under planted dups") {
    val hist = (0 until 300).map(i => s"hist doc ${i % 120}").toDF("text")
      .localCheckpoint(true)
    val batch = (0 until 200).map { i =>
      val text = if (i % 3 == 0) s"hist doc ${i % 120}" else s"new doc $i"
      (i.toLong, text)
    }.toDF("id", "text").localCheckpoint(true)
    val got = BloomDedup.newDocs(batch, hist, "text")
    val want = batch.join(hist, Seq("text"), "left_anti")
    assertSameRows(got.select("id", "text"), want.select("id", "text"))
    // sanity: the planted dups really were removed
    assert(got.count() < batch.count())
  }

  test("BloomDedup: tiny filter (forced false positives) still exact") {
    val hist = (0 until 500).map(i => s"h$i").toDF("text")
    val batch = (0 until 500).map(i => (i.toLong, s"b$i")).toDF("id", "text")
    // 64-bit filter for 500 items: saturated, nearly everything collides —
    // the exact verify join must reject every false positive
    val got = BloomDedup.newDocs(batch, hist, "text",
      expectedItems = 500L, numBits = 64L)
    assert(got.count() == 500)
  }

  test("BloomDedup: empty history returns the batch unchanged") {
    val hist = Seq.empty[String].toDF("text")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    assertSameRows(BloomDedup.newDocs(batch, hist, "text"), batch)
  }
}
