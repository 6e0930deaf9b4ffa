package graft.text

import graft.input.WebTable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis kernels for the large-scale training-data pipeline:
  * language id, quality scoring, tokenization, document fingerprinting.
  * All pure JVM functions wrapped as Catalyst expressions (batched, no
  * Python boundary), deterministic across partitionings.
  */
object TextAnalysis {

  // --- language id: character-bigram profiles -------------------------

  /** Tiny deterministic bigram profiles per language. Real deployments
    * would train these; here the profile table is fixed, public-knowledge
    * n-gram heuristics (most-frequent bigrams per language from published
    * frequency tables).
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
      "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar"),
    "de" -> Seq("er", "en", "ch", "de", "ei", "nd", "te", "in", "ie", "ge",
      "un", "st", "be", "sc", "ic", "he", "da", "au", "di", "se"),
    "fr" -> Seq("es", "le", "de", "en", "re", "nt", "on", "er", "ou", "ai",
      "it", "an", "la", "et", "qu", "ur", "me", "is", "us", "ti"),
    "es" -> Seq("de", "en", "el", "la", "os", "es", "ar", "er", "ra", "as",
      "an", "ci", "on", "or", "ue", "ta", "do", "al", "re", "co"),
    "pt" -> Seq("de", "os", "ar", "es", "ra", "en", "er", "as", "do", "da",
      "nt", "em", "co", "ma", "ad", "or", "que", "te", "se", "ca"))

  def languageOf(text: String): String = {
    if (text == null || text.length < 2) return "und"
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    var i = 0
    while (i < lower.length - 1) {
      val c1 = lower.charAt(i); val c2 = lower.charAt(i + 1)
      if (Character.isLetter(c1) && Character.isLetter(c2)) {
        val bg = s"$c1$c2"
        counts.update(bg, counts.getOrElse(bg, 0) + 1)
      }
      i += 1
    }
    if (counts.isEmpty) return "und"
    var best = "und"
    var bestScore = 0
    // Deterministic tie-break: iterate langs in sorted order.
    LangProfiles.toSeq.sortBy(_._1).foreach { case (lang, profile) =>
      var s = 0
      profile.foreach(bg => s += counts.getOrElse(bg, 0))
      if (s > bestScore) { best = lang; bestScore = s }
    }
    best
  }

  // --- quality scoring -------------------------------------------------

  /** Stopword set used by [[qualityScore]] — public so the q26 oracle SQL
    * can be generated from the same constant (no drift).
    */
  val StopWords: Set[String] =
    Set("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  /** Heuristic quality score in [0, 1]: length band + alpha ratio +
    * stopword presence + not-too-much punctuation. Deterministic double
    * math (fixed evaluation order).
    */
  def qualityScore(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val len = text.length
    var alpha = 0; var punct = 0; var spaces = 0
    var i = 0
    while (i < len) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) alpha += 1
      else if (c == ' ') spaces += 1
      else if (!Character.isLetterOrDigit(c)) punct += 1
      i += 1
    }
    val words = tokenize(text)
    val nWords = words.length
    if (nWords == 0) return 0.0
    val nStop = words.count(w => StopWords.contains(w.toLowerCase(java.util.Locale.ROOT)))
    val meanWordLen = words.map(_.length).sum.toDouble / nWords
    val lenScore = math.min(1.0, nWords / 20.0)
    val alphaScore = alpha.toDouble / len
    val punctScore = math.max(0.0, 1.0 - 4.0 * punct.toDouble / len)
    val stopScore = math.min(1.0, 4.0 * nStop.toDouble / nWords)
    val wordLenScore = if (meanWordLen >= 2.5 && meanWordLen <= 9.0) 1.0 else 0.4
    0.3 * lenScore + 0.25 * alphaScore + 0.2 * punctScore +
      0.15 * stopScore + 0.1 * wordLenScore
  }

  // --- tokenization -----------------------------------------------------

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single other
    * non-space chars (the GPT-2-style regex class without lookahead).
    */
  def tokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        val s = i
        while (i < n && Character.isLetter(text.charAt(i))) i += 1
        out += text.substring(s, i)
      } else if (Character.isDigit(c)) {
        val s = i
        while (i < n && Character.isDigit(text.charAt(i))) i += 1
        out += text.substring(s, i)
      } else if (!Character.isWhitespace(c)) {
        out += c.toString
        i += 1
      } else i += 1
    }
    out.toArray
  }

  def tokenCount(text: String): Long = tokenize(text).length.toLong

  // --- fingerprint ------------------------------------------------------

  /** 64-bit polynomial rolling-hash fingerprint over the normalized text
    * (lowercase, collapsed whitespace) — content-defined, byte-stable.
    */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    val norm = text.toLowerCase(java.util.Locale.ROOT).trim
    var h = 1469598103934665603L
    var i = 0
    var lastSpace = false
    while (i < norm.length) {
      val c0 = norm.charAt(i)
      val isWs = Character.isWhitespace(c0)
      val c = if (isWs) ' ' else c0
      if (!(isWs && lastSpace)) { h = (h ^ c.toLong) * 1099511628211L }
      lastSpace = isWs
      i += 1
    }
    h
  }

  // --- shingles (shared with Dedup) -------------------------------------

  /** FNV-1a over the UTF-8 encoding of `s[from, to)`, continuing from
    * `h0` — allocation-free equivalent of hashing `s.substring.getBytes`.
    */
  private def fnvUtf8(s: String, from: Int, to: Int, h0: Long): Long = {
    var h = h0
    @inline def mix(b: Int): Unit = { h = (h ^ (b & 0xffL)) * 0x100000001b3L }
    var i = from
    while (i < to) {
      val c = s.charAt(i)
      if (c < 0x80) mix(c)
      else if (c < 0x800) { mix(0xc0 | (c >> 6)); mix(0x80 | (c & 0x3f)) }
      else if (Character.isSurrogate(c)) {
        if (Character.isHighSurrogate(c) && i + 1 < to &&
            Character.isLowSurrogate(s.charAt(i + 1))) {
          val cp = Character.toCodePoint(c, s.charAt(i + 1))
          mix(0xf0 | (cp >> 18)); mix(0x80 | ((cp >> 12) & 0x3f))
          mix(0x80 | ((cp >> 6) & 0x3f)); mix(0x80 | (cp & 0x3f))
          i += 1
        } else mix('?') // JDK UTF-8 encoder replaces lone surrogates
      } else { mix(0xe0 | (c >> 12)); mix(0x80 | ((c >> 6) & 0x3f)); mix(0x80 | (c & 0x3f)) }
      i += 1
    }
    h
  }

  private val FnvBasis = 0xcbf29ce484222325L

  /** Hashes of word w-shingles (w consecutive tokens). Values are exactly
    * `hash64(tokens.slice(i, i+w).mkString(" "))` — pinned by DedupSpec's
    * brute-force oracles — but computed allocation-free: token spans are
    * located once, each shingle hash streams FNV over the spans plus the
    * joining spaces. Signature computation is the dedup pipeline's hot
    * loop at corpus scale (the same text bytes are read w times; the old
    * substring + mkString + getBytes path allocated ~4 objects per
    * shingle).
    */
  def shingleHashes(text: String, w: Int): Array[Long] = {
    val lower = if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT)
    // token spans, same boundaries as tokenize()
    val n = lower.length
    var cap = 16
    var starts = new Array[Int](cap); var ends = new Array[Int](cap)
    var nt = 0
    @inline def push(s: Int, e: Int): Unit = {
      if (nt == cap) {
        cap *= 2
        starts = java.util.Arrays.copyOf(starts, cap)
        ends = java.util.Arrays.copyOf(ends, cap)
      }
      starts(nt) = s; ends(nt) = e; nt += 1
    }
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if (Character.isLetter(c)) {
        val s = i
        while (i < n && Character.isLetter(lower.charAt(i))) i += 1
        push(s, i)
      } else if (Character.isDigit(c)) {
        val s = i
        while (i < n && Character.isDigit(lower.charAt(i))) i += 1
        push(s, i)
      } else if (!Character.isWhitespace(c)) { push(i, i + 1); i += 1 }
      else i += 1
    }
    @inline def shingleHash(from: Int, width: Int): Long = {
      var h = FnvBasis
      var k = 0
      while (k < width) {
        h = fnvUtf8(lower, starts(from + k), ends(from + k), h)
        if (k < width - 1) h = (h ^ 0x20L) * 0x100000001b3L // joining space
        k += 1
      }
      h
    }
    if (nt < w) {
      if (nt == 0) Array.empty
      else Array(shingleHash(0, nt))
    } else {
      val out = new Array[Long](nt - w + 1)
      var s = 0
      while (s + w <= nt) { out(s) = shingleHash(s, w); s += 1 }
      out
    }
  }

  // --- Column API --------------------------------------------------------

  def lang_id(text: Column): Column =
    Bridge.column(TextKernel(Bridge.expression(text), "langid"))
  def quality_score(text: Column): Column =
    Bridge.column(TextKernelDouble(Bridge.expression(text)))
  def token_count(text: Column): Column =
    Bridge.column(TextKernelLong(Bridge.expression(text), "tokens"))
  def fingerprint(text: Column): Column =
    Bridge.column(TextKernelLong(Bridge.expression(text), "fingerprint"))
}

case class TextKernel(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextAnalysis.languageOf(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class TextKernelDouble(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    TextAnalysis.qualityScore(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class TextKernelLong(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    kind match {
      case "tokens" => TextAnalysis.tokenCount(s)
      case "fingerprint" => TextAnalysis.fingerprint64(s)
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
