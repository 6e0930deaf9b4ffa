package graft.input

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import graft.core.Constants
import graft.text.TextExtract
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One synthetic web page row — the graft's canonical input shape
  * (`BASELINE.json` input_hint): url, warc_ts, html (raw bytes), text
  * (extracted), lang. `geometry` is attached downstream by geocoding.
  */
case class WebPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic Common-Crawl-style web-page table.
  *
  * At 10^12-document design scale the real input would be an Iceberg
  * table; in-sandbox we synthesize rows with `spark.range` (already
  * partitioned, no driver materialization, no shuffle) and a pure
  * row function of (id, seed) — identical bytes at any parallelism.
  */
object WebTable {
  val Langs: Array[String] = Array("en", "de", "fr", "es", "zh", "ru", "pt", "ja")

  private val Words: Array[String] = Array(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "spark", "scala", "query", "table", "tile", "grid", "cell", "index",
    "join", "scan", "merge", "sort", "window", "batch", "stream", "shuffle",
    "north", "east", "south", "west", "river", "forest", "meadow", "coast")

  /** splitmix64 — public-domain mixing function; our only RNG. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d9a129d133111bL
    z ^ (z >>> 31)
  }

  /** Deterministic 64-bit hash of a string (FNV-1a over UTF-8 bytes). */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(UTF_8)
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  def urlFor(i: Long): String = s"https://site-${i % 1000}.example/page/$i"

  /** Deterministic geocode of a url into the BNG extent (EPSG:27700).
    * The 10^12-scale story: url hash is uniform, so cells are uniform
    * except for the deliberately skewed hot-site block (sites 0-9 all map
    * into one 10 km cell) used by the skew/salting tests.
    */
  def geocode(url: String): (Double, Double) = {
    val h = splitmix64(hash64(url))
    val site = {
      val s = url.indexOf("site-")
      val e = url.indexOf(".example")
      if (s >= 0 && e > s) url.substring(s + 5, e).toLong else 999L
    }
    if (site < 10) {
      // hot cell: central London-ish 10 km square TQ38 (530000-540000, 180000-190000)
      val x = 530000.0 + java.lang.Long.remainderUnsigned(h, 10000L)
      val y = 180000.0 + java.lang.Long.remainderUnsigned(h >>> 17, 10000L)
      (x, y)
    } else {
      val x = java.lang.Long.remainderUnsigned(h, Constants.BngXMax).toDouble
      val y = java.lang.Long.remainderUnsigned(splitmix64(h), Constants.BngYMax).toDouble
      (x, y)
    }
  }

  def htmlFor(i: Long, seed: Long): String = {
    val r0 = splitmix64(seed ^ i)
    val nWords = 8 + java.lang.Long.remainderUnsigned(r0, 40L).toInt
    val sb = new StringBuilder()
    var k = 0
    var r = r0
    while (k < nWords) {
      r = splitmix64(r)
      sb.append(Words(java.lang.Long.remainderUnsigned(r, Words.length.toLong).toInt))
      if (k % 7 == 6) sb.append(". ") else sb.append(' ')
      k += 1
    }
    val body = sb.toString.trim
    s"""<html><head><title>Page $i &amp; friends</title>
       |<script>var x = $i; // not text</script>
       |<style>p { color: red }</style></head>
       |<body><h1>Doc &#8470; $i</h1><p>$body</p>
       |<p>lang=${langFor(i)} &lt;tagged&gt;</p></body></html>""".stripMargin
  }

  def langFor(i: Long): String = Langs((i % Langs.length).toInt)

  def pageFor(i: Long, seed: Long): WebPage = {
    val html = htmlFor(i, seed)
    val htmlBytes = html.getBytes(UTF_8)
    WebPage(
      url = urlFor(i),
      warc_ts = new Timestamp(1577836800000L + i * 1000L), // 2020-01-01 + i sec
      html = htmlBytes,
      text = TextExtract.extractText(htmlBytes),
      lang = langFor(i))
  }

  /** Distributed deterministic synthesis: no collect, no shuffle; rows are
    * a pure function of their id so any partitioning yields identical data.
    */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0): Dataset[WebPage] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n)
    base.map(i => pageFor(i, seed))
  }

  /** Synthesized table with geometry attached (WKB point in EPSG:27700)
    * plus raw x/y for expression fast paths.
    */
  def synthesizeGeo(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.geo.GeoExpressions._
    val pages = synthesize(spark, n, seed, partitions).toDF()
    val withXY = pages
      .withColumn("x", xyUdfX(col("url")))
      .withColumn("y", xyUdfY(col("url")))
    withXY.withColumn("geometry", st_point(col("x"), col("y")))
  }

  // Geocode as expressions (kept as deterministic scala functions wrapped
  // in codegen-fallback expressions via typed map would lose columns; a udf
  // here is acceptable: it is a pure scalar function on the driver-defined
  // closure, still whole-stage-codegen-adjacent).
  private val xyUdfX = org.apache.spark.sql.functions.udf((url: String) => geocode(url)._1)
  private val xyUdfY = org.apache.spark.sql.functions.udf((url: String) => geocode(url)._2)
}
