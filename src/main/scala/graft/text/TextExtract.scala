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

  /** Single-pass state machine (hot path at 10^12 rows: the naive
    * drop-blocks / strip-tags / decode / collapse pipeline allocates ~6
    * intermediate strings per document; this allocates one builder + the
    * result). Semantics identical to the documented contract above;
    * pinned by TextExtractSpec.
    */
  def extractText(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(math.min(n, 512))
    var pendingSpace = false

    def appendChar(c: Char): Unit = {
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
    }

    // position after a <name...>...</name> block (or end if unterminated)
    def skipBlock(i: Int, name: String): Int = {
      val close = "</" + name + ">"
      var j = i
      while (j <= n - close.length) {
        if (html.regionMatches(true, j, close, 0, close.length))
          return j + close.length
        j += 1
      }
      n
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(true, i + 1, "script", 0, 6)) i = skipBlock(i, "script")
        else if (html.regionMatches(true, i + 1, "style", 0, 5)) i = skipBlock(i, "style")
        else {
          // skip to end of tag (unterminated tag swallows the tail)
          val gt = html.indexOf('>', i + 1)
          i = if (gt < 0) n else gt + 1
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          var handled = true
          if (html.regionMatches(false, i + 1, "amp", 0, semi - i - 1) && semi - i - 1 == 3) appendChar('&')
          else if (semi - i - 1 == 2 && html.charAt(i + 1) == 'l' && html.charAt(i + 2) == 't') appendChar('<')
          else if (semi - i - 1 == 2 && html.charAt(i + 1) == 'g' && html.charAt(i + 2) == 't') appendChar('>')
          else if (semi - i - 1 == 4 && html.regionMatches(false, i + 1, "quot", 0, 4)) appendChar('"')
          else if (semi - i - 1 == 4 && html.regionMatches(false, i + 1, "apos", 0, 4)) appendChar('\'')
          else if (semi - i - 1 == 4 && html.regionMatches(false, i + 1, "nbsp", 0, 4)) appendChar(' ')
          else if (html.charAt(i + 1) == '#' && semi - i - 1 > 1) {
            var cp = 0
            var k = i + 2
            var ok = true
            while (k < semi && ok) {
              val d = html.charAt(k)
              if (d >= '0' && d <= '9') cp = cp * 10 + (d - '0') else ok = false
              k += 1
            }
            if (ok) {
              if (cp < 0x10000) appendChar(cp.toChar)
              else {
                if (pendingSpace && sb.length > 0) { sb.append(' ') }
                pendingSpace = false
                sb.appendCodePoint(cp)
              }
            } else handled = false
          } else handled = false
          i = if (handled) semi + 1 else { appendChar(c); i + 1 }
        } else { appendChar(c); i += 1 }
      } else { appendChar(c); i += 1 }
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
