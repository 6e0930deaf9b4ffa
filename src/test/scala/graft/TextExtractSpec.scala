package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.input.WebTable
import graft.text.TextExtract
import org.apache.spark.sql.functions._

class TextExtractSpec extends SparkSpec {

  test("strips tags, script/style, decodes entities, collapses whitespace") {
    val html =
      """<html><head><title>T &amp; t</title><script>ignore()</script>
        |<style>p{}</style></head>
        |<body><p>a  b</p> <p>&lt;x&gt; &#65;</p></body></html>""".stripMargin
    assert(TextExtract.extractText(html) == "T & t a b <x> A")
  }

  test("deterministic: identical bytes in, identical bytes out") {
    val page = WebTable.pageFor(123L, 42L)
    val t1 = TextExtract.extractText(page.html)
    val t2 = TextExtract.extractText(page.html.clone())
    assert(java.util.Arrays.equals(t1.getBytes(UTF_8), t2.getBytes(UTF_8)))
    assert(t1 == page.text)
  }

  test("byte-identical text invariant under different parallelism (north rule)") {
    import spark.implicits._
    val a = WebTable.synthesize(spark, 500, seed = 7L, partitions = 1)
      .map(p => (p.url, p.text)).collect().sortBy(_._1)
    val b = WebTable.synthesize(spark, 500, seed = 7L, partitions = 13)
      .map(p => (p.url, p.text)).collect().sortBy(_._1)
    assert(a.length == 500 && b.length == 500)
    a.zip(b).foreach { case ((u1, t1), (u2, t2)) =>
      assert(u1 == u2)
      assert(java.util.Arrays.equals(t1.getBytes(UTF_8), t2.getBytes(UTF_8)),
        s"text bytes differ for $u1")
    }
  }

  test("extract_text expression matches the pure function distributed") {
    val df = WebTable.synthesize(spark, 200, seed = 11L).toDF()
      .withColumn("re", TextExtract.extract_text(col("html")))
    assert(df.filter(col("re") =!= col("text")).count() == 0)
  }
}
