package graft

import graft.text.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  test("shingleHashes equals the definitional hash64(joined tokens) (fuzz incl. unicode)") {
    def definitional(text: String, w: Int): Array[Long] = {
      val toks = TextAnalysis.tokenize(
        if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT))
      if (toks.length < w) {
        if (toks.isEmpty) Array.empty
        else Array(graft.input.WebTable.hash64(toks.mkString(" ")))
      } else (0 to toks.length - w).map(i =>
        graft.input.WebTable.hash64(toks.slice(i, i + w).mkString(" "))).toArray
    }
    val alphabet = "abz AZ09 .,!-éß中😀\t\n"
    (0 until 500).foreach { k =>
      var r = graft.input.WebTable.splitmix64(k.toLong * 613L)
      val len = (java.lang.Long.remainderUnsigned(r, 120L)).toInt
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        r = graft.input.WebTable.splitmix64(r)
        sb.append(alphabet.charAt(
          java.lang.Long.remainderUnsigned(r, alphabet.length.toLong).toInt))
      }
      val s = sb.toString
      (1 to 4).foreach { w =>
        assert(TextAnalysis.shingleHashes(s, w).toSeq == definitional(s, w).toSeq,
          s"w=$w text=${s.take(60)}")
      }
    }
    assert(TextAnalysis.shingleHashes(null, 3).isEmpty)
  }

  test("tokenize: letter runs, digit runs, single punct, no whitespace") {
    assert(TextAnalysis.tokenize("hello world 42!").toSeq ==
      Seq("hello", "world", "42", "!"))
    assert(TextAnalysis.tokenize("a1b2").toSeq == Seq("a", "1", "b", "2"))
    assert(TextAnalysis.tokenize("  ").isEmpty)
    assert(TextAnalysis.tokenize(null).isEmpty)
  }

  test("language id distinguishes clear samples") {
    assert(TextAnalysis.languageOf(
      "the quick brown fox is in the garden and it is raining") == "en")
    assert(TextAnalysis.languageOf(
      "der schnelle braune fuchs springt durch den deutschen wald und die wiese") == "de")
    assert(TextAnalysis.languageOf(
      "le renard brun est dans le jardin et il mange les pommes rouges") == "fr")
    assert(TextAnalysis.languageOf("") == "und")
    assert(TextAnalysis.languageOf("12345 678") == "und")
  }

  test("quality score ordering: real prose > punctuation soup > empty") {
    val good = TextAnalysis.qualityScore(
      "the gentle river flows through the old town and carries small boats to the sea")
    val soup = TextAnalysis.qualityScore("!!! ??? ;;; ### $$$ %%%")
    assert(good > soup)
    assert(TextAnalysis.qualityScore("") == 0.0)
    assert(good >= 0.0 && good <= 1.0)
  }

  test("fingerprint is whitespace-normalized and case-insensitive, content-sensitive") {
    val a = TextAnalysis.fingerprint64("Hello   World")
    val b = TextAnalysis.fingerprint64("hello world")
    val c = TextAnalysis.fingerprint64("hello worlds")
    assert(a == b)
    assert(a != c)
  }

  test("shingleHashes: w-shingles over tokens, short-doc fallback") {
    val sh = TextAnalysis.shingleHashes("a b c d", 3)
    assert(sh.length == 2) // (a b c), (b c d)
    assert(TextAnalysis.shingleHashes("a b", 3).length == 1) // fallback whole doc
    assert(TextAnalysis.shingleHashes("", 3).isEmpty)
  }
}
