package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** The two round-14 web-pipeline front-door operators, pinned on hand
  * fixtures: HTML main-content extraction (adversarial script/style
  * payloads, entities, boilerplate chrome) and URL canonicalization
  * (the rule table, one messy variant per rule). The board keys
  * (`text_html_extract`, `dedup_url`) hash-match DuckDB over the
  * documents fixture; these specs pin the SEMANTICS on inputs the
  * fixture can't express. */
class HtmlUrlSpec extends SparkSpec {

  private def mainOf(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(TextAnalysis.htmlMainText(col("h"))).head().getString(0)
  }
  private def pageOf(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(TextAnalysis.htmlVisibleText(col("h"))).head().getString(0)
  }

  test("html: script/style payloads drop even when their bodies carry fake closing tags") {
    val html = """<html><head><style>p{content:"</div>"}</style>""" +
      """<script>if(1<2&&x>"</p>"){v="</div>";}</script></head>""" +
      """<body><div id="main"><p>real text</p></div></body></html>"""
    assert(mainOf(html) == "real text")
    assert(pageOf(html) == "real text")
  }

  test("html: entities decode in visible text, &amp;-last so double-escapes stay escaped") {
    val html = """<div id="main"><p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e &amp; f &amp;lt;raw</p></div>"""
    assert(mainOf(html) == """a <b> "c" 'd' e & f &lt;raw""")
  }

  test("html: nav/footer boilerplate drops from page text but nested inline tags survive as text") {
    val html = """<body><nav>Home | <a href="/x">About</a></nav>""" +
      """<div id="main"><h1>Title</h1><p>body <b>bold</b> tail</p></div>""" +
      """<footer>(c) 2026</footer></body>"""
    assert(pageOf(html) == "Title body bold tail")
    assert(mainOf(html) == "Title body bold tail")
  }

  test("html: whitespace squeezes across newlines and stripped tag boundaries") {
    val html = "<div id=\"main\">\n  <p>a</p>\n\t<p>b\n c</p>\n</div>"
    assert(mainOf(html) == "a b c")
  }

  test("html: a page without a main block extracts empty main but keeps page text") {
    val html = """<body><p>loose text</p></body>"""
    assert(mainOf(html) == "")
    assert(pageOf(html) == "loose text")
  }

  test("url canonicalization rule table") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host case-fold; path case PRESERVED
      "HTTPS://Example.COM/Path?a=1" -> "https://example.com/Path?a=1",
      // default ports strip per scheme; non-default ports survive
      "https://example.com:443/x" -> "https://example.com/x",
      "http://example.com:80/x" -> "http://example.com/x",
      "http://example.com:8080/x" -> "http://example.com:8080/x",
      "https://example.com:80/x" -> "https://example.com:80/x",
      // fragment strips
      "https://example.com/x#sec-2" -> "https://example.com/x",
      // tracking params drop, survivors SORT, empty query drops the '?'
      "https://example.com/x?utm_source=a&b=2&a=1" -> "https://example.com/x?a=1&b=2",
      "https://example.com/x?utm_campaign=z&gclid=1&fbclid=2" -> "https://example.com/x",
      // VALUELESS click ids (real share links) drop too; lookalike
      // params that merely share a prefix survive
      "https://example.com/x?fbclid&a=1" -> "https://example.com/x?a=1",
      "https://example.com/x?gclid" -> "https://example.com/x",
      "https://example.com/x?gclid2=keep" -> "https://example.com/x?gclid2=keep",
      // trailing slashes normalize; root stays root
      "https://example.com/x/?a=1" -> "https://example.com/x?a=1",
      "https://example.com/" -> "https://example.com/",
      "https://example.com" -> "https://example.com/")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), Dedup.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"canonicalUrl($in)")
    }
  }

  test("url dedup: the three https variants collapse to one key, http stays separate") {
    val t = graft.sources.Tables(spark, sf0001)
    val out = Dedup.urlDedup(t).collect()
    val byUrl = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    // every canonical key is fully canonical (lowercase pre, no
    // fragments, no tracking params, no default ports)
    assert(byUrl.keys.forall(u => u.startsWith("http://") || u.startsWith("https://")))
    assert(byUrl.keys.forall(u => !u.contains("#") && !u.contains("utm_") &&
      !u.contains("gclid") && !u.contains(":443") && !u.contains(":80/")))
    // https keys carry the collapsed variants {0,1,2}; http keys only variant 3
    val (https, http) = byUrl.partition(_._1.startsWith("https://"))
    assert(https.nonEmpty && http.nonEmpty)
    val docs = t.documents.count()
    assert(byUrl.values.sum == docs, "every document lands in exactly one canonical key")
    // survivor is the minimum doc_id of its group
    val survivors = out.map(r => (r.getString(0), r.getLong(2))).toMap
    val canon = t.documents.select(col("doc_id"),
      Dedup.canonicalUrl(
        when(col("doc_id") % 4 === 0, concat(lit("https://Example.COM/path"),
          (col("doc_id") % 50).cast("string"), lit("?utm_source=x&b=2&a=1#frag")))
        .when(col("doc_id") % 4 === 1, concat(lit("HTTPS://example.com:443/path"),
          (col("doc_id") % 50).cast("string"), lit("?a=1&b=2")))
        .when(col("doc_id") % 4 === 2, concat(lit("https://example.com/path"),
          (col("doc_id") % 50).cast("string"), lit("/?b=2&a=1&gclid=99")))
        .otherwise(concat(lit("http://example.com:80/path"),
          (col("doc_id") % 50).cast("string"), lit("?a=1")))).as("url"))
      .groupBy("url").agg(min("doc_id").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(survivors == canon)
  }
}
