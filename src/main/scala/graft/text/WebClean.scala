package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Web-corpus cleaning kernels for the training-data pipeline, beyond the
  * reference's own surface: Gopher-style repetition signals, URL
  * canonicalization, and PII scrubbing. All row-local Catalyst
  * expressions — zero shuffle, deterministic at any parallelism, and each
  * emits integer counts (not float ratios) so driver oracles compare
  * exactly.
  *
  * Public-knowledge designs: repetition quality signals follow the
  * published Gopher data-quality heuristics (duplicate n-gram and
  * most-frequent-word fractions); URL canonicalization follows RFC 3986
  * normalization (case of scheme/host, default ports, fragments) plus the
  * common crawl-dedup conventions (strip `www.`, sort query params, strip
  * trailing slash).
  */
object WebClean {

  // ------------------------------------------------------------------
  // Repetition signals
  // ------------------------------------------------------------------

  /** Tokens = split on single spaces, KEEPING empty tokens — exactly
    * `string_split(text, ' ')` / Java `split(" ", -1)` semantics, so SQL
    * oracles reproduce the counts bit-for-bit.
    */
  private[text] def spaceSplit(s: String): Array[String] = {
    var n = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') n += 1; i += 1 }
    val out = new Array[String](n)
    var from = 0; var k = 0; i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { out(k) = s.substring(from, i); k += 1; from = i + 1 }
      i += 1
    }
    out(k) = s.substring(from)
    out
  }

  /** (n_words, top_word_n, dup_2gram_n, dup_3gram_n) in one pass:
    * total token count, multiplicity of the most frequent token, and the
    * number of duplicate consecutive word 2-/3-grams (total minus
    * distinct). Ratios like Gopher's "fraction of duplicated 3-grams"
    * are `dup_3gram_n / (n_words - 2)` — left to the caller so the
    * engine output stays integer-exact.
    */
  def repetitionCounts(text: String): (Long, Long, Long, Long) = {
    val toks = spaceSplit(text)
    val n = toks.length
    val wordCounts = new java.util.HashMap[String, Integer](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val prev = wordCounts.get(toks(i))
      val c = if (prev == null) 1 else prev.intValue() + 1
      wordCounts.put(toks(i), c)
      if (c > top) top = c
      i += 1
    }
    // joining tokens with ' ' is injective (tokens never contain spaces)
    val g2 = new java.util.HashSet[String]()
    var dup2 = 0L
    i = 0
    while (i < n - 1) {
      if (!g2.add(toks(i) + " " + toks(i + 1))) dup2 += 1
      i += 1
    }
    val g3 = new java.util.HashSet[String]()
    var dup3 = 0L
    i = 0
    while (i < n - 2) {
      if (!g3.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))) dup3 += 1
      i += 1
    }
    (n.toLong, top.toLong, dup2, dup3)
  }

  /** Per-document term frequencies, sorted by word — the row-local half
    * of TF-IDF: computing TF inside the row means the corpus-level DF
    * aggregation sees each (doc, word) exactly once, so the only shuffle
    * the whole pipeline needs per stage is the word-keyed DF count (with
    * map-side combine). Token semantics match [[spaceSplit]].
    */
  def wordCounts(text: String): Array[(String, Long)] = {
    val toks = spaceSplit(text)
    val m = new java.util.TreeMap[String, java.lang.Long]()
    var i = 0
    while (i < toks.length) {
      val prev = m.get(toks(i))
      m.put(toks(i), if (prev == null) 1L else prev.longValue() + 1L)
      i += 1
    }
    val out = new Array[(String, Long)](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next(); out(k) = (e.getKey, e.getValue.longValue()); k += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // URL canonicalization
  // ------------------------------------------------------------------

  /** RFC 3986-style canonical form for crawl dedup:
    *  - scheme and host lowercased; leading `www.` stripped from the host
    *  - default ports dropped (http:80, https:443); other ports kept
    *  - single trailing `/` stripped from the path (`/a/` -> `/a`,
    *    bare `/` -> empty)
    *  - query parameters stable-sorted by parameter name (repeated
    *    names keep their relative value order); empty query dropped
    *  - fragment dropped
    * Userinfo, percent-encoding and path dot-segments are preserved
    * verbatim (documented deviation: full RFC normalization of those
    * needs a percent-decoder table; crawl URLs in practice are already
    * encoded consistently per site). Inputs without `://` are returned
    * unchanged.
    */
  def canonicalizeUrl(url: String): String = {
    val sep = url.indexOf("://")
    if (sep < 0) return url
    val scheme = url.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(sep + 3)
    // authority ends at the first of / ? #
    var aEnd = rest.length
    var i = 0
    while (i < aEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') aEnd = i else i += 1
    }
    val authority = rest.substring(0, aEnd)
    val tail = rest.substring(aEnd)
    // split path / query / fragment
    val hashAt = tail.indexOf('#')
    val noFrag = if (hashAt >= 0) tail.substring(0, hashAt) else tail
    val qAt = noFrag.indexOf('?')
    var path = if (qAt >= 0) noFrag.substring(0, qAt) else noFrag
    val query = if (qAt >= 0) noFrag.substring(qAt + 1) else ""
    // authority: [userinfo@]host[:port]
    val atAt = authority.lastIndexOf('@')
    val userinfo = if (atAt >= 0) authority.substring(0, atAt + 1) else ""
    val hostPort = authority.substring(atAt + 1)
    // bracketed IPv6 hosts ([::1]:8080) contain colons; the port colon
    // can only follow the closing bracket
    val bracketEnd = if (hostPort.startsWith("[")) hostPort.indexOf(']') else -1
    val colonAt =
      if (bracketEnd >= 0)
        if (bracketEnd + 1 < hostPort.length && hostPort.charAt(bracketEnd + 1) == ':')
          bracketEnd + 1
        else -1
      else hostPort.lastIndexOf(':')
    val portIsNum = colonAt >= 0 && colonAt < hostPort.length - 1 &&
      hostPort.substring(colonAt + 1).forall(_.isDigit)
    var host = (if (portIsNum) hostPort.substring(0, colonAt) else hostPort)
      .toLowerCase(java.util.Locale.ROOT)
    if (host.startsWith("www.")) host = host.substring(4)
    val port = if (portIsNum) hostPort.substring(colonAt + 1) else ""
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    if (path.length > 1 && path.endsWith("/")) path = path.substring(0, path.length - 1)
    else if (path == "/") path = ""
    val canonQuery =
      if (query.isEmpty) ""
      else "?" + query.split("&", -1).sortWith { (a, b) =>
        // stable ascending by param NAME (text before '='): repeated
        // names keep their relative value order (sortWith is stable)
        val an = a.indexOf('='); val bn = b.indexOf('=')
        val ak = if (an >= 0) a.substring(0, an) else a
        val bk = if (bn >= 0) b.substring(0, bn) else b
        ak.compareTo(bk) < 0
      }.mkString("&")
    scheme + "://" + userinfo + host + (if (keepPort) ":" + port else "") +
      path + canonQuery
  }

  // ------------------------------------------------------------------
  // PII scrubbing
  // ------------------------------------------------------------------

  // Patterns chosen to have IDENTICAL semantics in Java regex and RE2
  // (DuckDB), so oracle SQL can reproduce the scrub with regexp_replace:
  // plain classes, ASCII \d, \b word boundaries, greedy quantifiers.
  private val EmailRe = java.util.regex.Pattern.compile(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  private val Ipv4Re = java.util.regex.Pattern.compile(
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")
  private val PhoneRe = java.util.regex.Pattern.compile(
    "\\b\\d{3}-\\d{3}-\\d{4}\\b")

  /** Replace emails, IPv4 addresses, then phone numbers (in that fixed
    * order — email patterns subsume dotted hosts, so they must run before
    * the IP pass) with `<EMAIL>`/`<IP>`/`<PHONE>`. Returns the scrubbed
    * text plus per-kind match counts.
    */
  def scrubPii(text: String): (String, Long, Long, Long) = {
    var s = text
    var emails = 0L; var ips = 0L; var phones = 0L
    val em = EmailRe.matcher(s)
    val sb1 = new java.lang.StringBuilder
    while (em.find()) { emails += 1; em.appendReplacement(sb1, "<EMAIL>") }
    em.appendTail(sb1); s = sb1.toString
    val im = Ipv4Re.matcher(s)
    val sb2 = new java.lang.StringBuilder
    while (im.find()) { ips += 1; im.appendReplacement(sb2, "<IP>") }
    im.appendTail(sb2); s = sb2.toString
    val pm = PhoneRe.matcher(s)
    val sb3 = new java.lang.StringBuilder
    while (pm.find()) { phones += 1; pm.appendReplacement(sb3, "<PHONE>") }
    pm.appendTail(sb3); s = sb3.toString
    (s, emails, ips, phones)
  }

  // ------------------------------------------------------------------
  // Static kernels for codegen (called from generated Java — same
  // pattern as RhpKernel: expressions emit one static call instead of
  // falling back to the interpreted eval path, keeping the whole
  // projection inside whole-stage codegen without per-row boxing)
  // ------------------------------------------------------------------

  def repetitionRow(u: UTF8String): InternalRow = {
    val (n, top, d2, d3) = repetitionCounts(u.toString)
    InternalRow(n, top, d2, d3)
  }

  def piiRow(u: UTF8String): InternalRow = {
    val (s, e, ip, ph) = scrubPii(u.toString)
    InternalRow(UTF8String.fromString(s), e, ip, ph)
  }

  def urlCanonU8(u: UTF8String): UTF8String =
    UTF8String.fromString(canonicalizeUrl(u.toString))

  def wordCountsData(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val wc = wordCounts(u.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      wc.map { case (w, c) => InternalRow(UTF8String.fromString(w), c): Any })
  }

  // ------------------------------------------------------------------
  // Column API
  // ------------------------------------------------------------------

  def repetition_signals(text: Column): Column =
    Bridge.column(RepetitionSignals(Bridge.expression(text)))
  def word_counts(text: Column): Column =
    Bridge.column(WordCountsExpr(Bridge.expression(text)))
  def canonicalize_url(url: Column): Column =
    Bridge.column(UrlCanon(Bridge.expression(url)))
  def scrub_pii(text: Column): Column =
    Bridge.column(PiiScrub(Bridge.expression(text)))
}

/** struct(n_words, top_word_n, dup_2gram_n, dup_3gram_n) — see
  * [[WebClean.repetitionCounts]].
  */
case class RepetitionSignals(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("dup_2gram_n", LongType, nullable = false),
    StructField("dup_3gram_n", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    WebClean.repetitionRow(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.WebClean.repetitionRow($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array&lt;struct&lt;word, tf&gt;&gt; sorted by word — see
  * [[WebClean.wordCounts]].
  */
case class WordCountsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    WebClean.wordCountsData(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.WebClean.wordCountsData($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Canonical crawl-dedup URL — see [[WebClean.canonicalizeUrl]]. */
case class UrlCanon(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    WebClean.urlCanonU8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.WebClean.urlCanonU8($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** struct(scrubbed, n_email, n_ip, n_phone) — see [[WebClean.scrubPii]]. */
case class PiiScrub(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = true),
    StructField("n_email", LongType, nullable = false),
    StructField("n_ip", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    WebClean.piiRow(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.WebClean.piiRow($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
