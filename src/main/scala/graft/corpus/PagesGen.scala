package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.sql.Timestamp

/** One Common-Crawl-style page row — the authoritative input shape
  * (BASELINE.json input_hint):
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  */
final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                      text: String, lang: String)

/** Deterministic synthetic pages corpus (FIXTURES.md §1): generated
  * DISTRIBUTED (spark.range -> map, no driver loop, no RDD), reproducible
  * from (seed, id) alone so any partitioning yields identical rows.
  *
  * The HTML exercises the extraction kernel's branches — nested tags,
  * entities (named/legacy/numeric), script/style CDATA, comments, void
  * elements, attribute quoting, irregular whitespace, multi-byte UTF-8 —
  * while staying within the constructs covered by the CPython-generated
  * parity vectors. A configurable fraction of pages is stopword-heavy to
  * create the term-frequency skew the north rule requires handling.
  */
object PagesGen {

  private val stopwords = Array("the", "of", "and", "to", "in", "is", "it",
    "for", "that", "on", "as", "with")
  private val langs = Array("en", "en", "en", "en", "en", "en", "de", "fr",
    "es", "zh") // skewed like real crawls

  private def vocabWord(rnd: scala.util.Random, vocabSize: Int): String = {
    // zipf-ish: quadratic skew toward low indices
    val i = math.min((rnd.nextDouble() * rnd.nextDouble() * vocabSize).toInt,
      vocabSize - 1)
    s"w$i"
  }

  /** Deterministic page for a given id. */
  def gen(id: Long, seed: Long, vocabSize: Int = 5000,
          skewFraction: Double = 0.2): Page = {
    val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + id)
    val heavy = rnd.nextDouble() < skewFraction
    val lang = langs(rnd.nextInt(langs.length))
    val nParas = 1 + rnd.nextInt(5)
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html><html><head>")
    sb.append(s"<title>Page $id &amp; friends</title>")
    sb.append("<meta charset='utf-8'><link rel='stylesheet' href='s.css'>")
    if (rnd.nextBoolean())
      sb.append("<style>body { margin: 0; } /* comment 1 < 2 */</style>")
    sb.append("</head><body>")
    if (rnd.nextBoolean())
      sb.append(s"<script>var pageId = $id; if (1 < 2) { track('&amp;'); }</script>")
    sb.append(s"<!-- generated page $id -->")
    sb.append(s"<h1>Heading ${vocabWord(rnd, vocabSize)} &#${48 + rnd.nextInt(10)};</h1>\n")
    var p = 0
    while (p < nParas) {
      sb.append("<p>")
      val words = 10 + rnd.nextInt(80)
      var w = 0
      while (w < words) {
        val word =
          if (heavy && rnd.nextDouble() < 0.6) stopwords(rnd.nextInt(stopwords.length))
          else if (rnd.nextDouble() < 0.25) stopwords(rnd.nextInt(stopwords.length))
          else vocabWord(rnd, vocabSize)
        if (rnd.nextInt(50) == 0) sb.append("<b>").append(word).append("</b>")
        else if (rnd.nextInt(60) == 0)
          sb.append(s"<a href='/l/$w?a=1&amp;b=2'>").append(word).append("</a>")
        else sb.append(word)
        sb.append(' ')
        w += 1
      }
      if (rnd.nextInt(8) == 0) sb.append("café señor 你好 ")
      if (rnd.nextInt(10) == 0) sb.append("&hellip; &mdash; &nbsp;x ")
      sb.append("</p>\n")
      if (rnd.nextInt(4) == 0) sb.append("<br><hr>\n")
      p += 1
    }
    sb.append("</body></html>")
    val html = sb.toString
    Page(
      url = s"http://site${rnd.nextInt(1000)}.example.test/p/$id",
      warc_ts = new Timestamp(1700000000000L + id * 1000L),
      html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = null, // extraction is the engine's job
      lang = lang)
  }

  /** Distributed generator. */
  def pages(spark: SparkSession, n: Long, partitions: Int = 32,
            seed: Long = 42, vocabSize: Int = 5000,
            skewFraction: Double = 0.2): Dataset[Page] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions)
      .map(i => gen(i, seed, vocabSize, skewFraction))
  }
}
