package graft

import graft.text.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

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
