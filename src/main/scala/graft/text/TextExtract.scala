package graft.text

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HTML -> text extraction (graft operator U6, SURVEY.md
  * §2.5). The north-rule invariant is per-url BYTE-identical text: the
  * same html bytes must produce the same text bytes on every run, every
  * partition layout, every parallelism level. Everything here is fixed to
  * UTF-8 and pure string math — no locale, no charset default, no regex
  * engine version dependence.
  *
  * Extraction rule (documented contract):
  *  1. decode bytes as UTF-8;
  *  2. drop <script>...</script> and <style>...</style> blocks entirely;
  *  3. strip all remaining tags `<...>`;
  *  4. decode the five XML entities plus decimal `&#NNN;` references;
  *  5. collapse every run of Unicode whitespace to a single space, trim.
  */
object TextExtract {
  def extractText(html: Array[Byte]): String = extractText(new String(html, UTF_8))

  def extractText(html: String): String = {
    val noBlocks = dropBlock(dropBlock(html, "script"), "style")
    val sb = new java.lang.StringBuilder(noBlocks.length)
    var i = 0
    var inTag = false
    while (i < noBlocks.length) {
      val c = noBlocks.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    collapseWhitespace(decodeEntities(sb.toString))
  }

  /** Remove <name ...>...</name> blocks, case-insensitive, non-nested. */
  private def dropBlock(s: String, name: String): String = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val open = "<" + name
    val close = "</" + name + ">"
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val start = lower.indexOf(open, i)
      if (start < 0) { sb.append(s, i, s.length); i = s.length }
      else {
        sb.append(s, i, start)
        val end = lower.indexOf(close, start)
        i = if (end < 0) s.length else end + close.length
      }
    }
    sb.toString
  }

  private def decodeEntities(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          s.substring(i + 1, semi) match {
            case "amp" => sb.append('&'); i = semi + 1
            case "lt" => sb.append('<'); i = semi + 1
            case "gt" => sb.append('>'); i = semi + 1
            case "quot" => sb.append('"'); i = semi + 1
            case "apos" => sb.append('\''); i = semi + 1
            case "nbsp" => sb.append(' '); i = semi + 1
            case e if e.startsWith("#") && e.length > 1 &&
                e.drop(1).forall(_.isDigit) =>
              sb.appendCodePoint(e.drop(1).toInt); i = semi + 1
            case _ => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def collapseWhitespace(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Column form: BinaryType html -> StringType text. */
  def extract_text(html: Column): Column =
    Bridge.column(ExtractTextExpr(Bridge.expression(html)))
}

case class ExtractTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextExtract.extractText(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
