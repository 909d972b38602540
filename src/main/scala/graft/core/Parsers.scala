package graft.core

import java.nio.charset.StandardCharsets

/** Per-site parser registry — SURVEY.md §2 ops 35/47/48.
  *
  * The reference's raison d'être is ~50 site-specific HTML→text parsers; the
  * north_rule's per-row invariant is "byte-identical extracted text per url"
  * (BASELINE.json input_hint). With /root/reference empty (SURVEY.md §0) the
  * contract is realized against synthesized fixtures: the SAME template
  * constants drive the fixture generator (render) and the extractor
  * (extract), so `extract(host, render(...)) == text` holds byte-exactly by
  * construction, and the distributed pipeline must reproduce it.
  *
  * Three host families (FIXTURES.md B1): 0 reuters-style, 1 prnewswire-style,
  * 2 bloomberg-style — each with distinct wrapper markup so each needs its
  * own parse rule. Family of a host is frozen in [[FixtureConstants]].
  *
  * Everything is pure Scala (no Spark imports): the pipeline wraps these in
  * a UDF placed AFTER budget-filtering so only scheduled rows pay the parse
  * (SURVEY.md §4 codegen note), the sequential oracle calls them directly.
  */
object Parsers {

  /** (prefix-before-body, suffix-after-body) per family; title is spliced
    * into the prefix. Bodies in the fixture corpus never contain '<'. */
  private def articleWrappers(family: Int, title: String, source: String): (String, String) =
    family match {
      case 0 =>
        (s"""<html><head><title>$title</title></head><body><div class="ArticleBody">""",
          s"""</div><footer>© $source</footer></body></html>""")
      case 1 =>
        (s"""<html><head><title>$title</title></head><body><article><p class="pr-body">""",
          s"""</p></article><div id="footer">Contact</div></body></html>""")
      case _ =>
        (s"""<html><head><title>$title</title><meta name="bb"/></head><body><section data-component="body"><span>""",
          s"""</span></section></body></html>""")
    }

  /** (start-marker, end-marker) the extractor searches for, per family. */
  private val markers: Array[(String, String)] = Array(
    ("""<div class="ArticleBody">""", """</div>"""),
    ("""<p class="pr-body">""", """</p>"""),
    ("""<section data-component="body"><span>""", """</span>"""))

  /** Render an article page for (family, title, source, body) → UTF-8 bytes. */
  def renderArticle(family: Int, title: String, source: String, body: String): Array[Byte] = {
    val (pre, post) = articleWrappers(family, title, source)
    (pre + body + post).getBytes(StandardCharsets.UTF_8)
  }

  /** Render a listing (site-root) page linking to `urls` → UTF-8 bytes. */
  def renderListing(host: String, urls: Seq[String]): Array[Byte] = {
    val items = urls.map(u => s"""<li><a href="$u">$u</a></li>""").mkString
    (s"""<html><head><title>$host</title></head><body><ul class="headlines">""" +
      items + "</ul></body></html>").getBytes(StandardCharsets.UTF_8)
  }

  /** Extract article text from page bytes for a host; "" when the page has
    * no article body (e.g. listing pages). THE byte-identity contract. */
  def extract(host: String, html: Array[Byte]): String = {
    if (html == null) return ""
    val s = new String(html, StandardCharsets.UTF_8)
    val family = FixtureConstants.familyOf(host)
    val (start, end) = markers(family)
    val i = s.indexOf(start)
    if (i < 0) return ""
    val from = i + start.length
    val j = s.indexOf(end, from)
    if (j < 0) "" else s.substring(from, j)
  }

  private val HrefRe = """href="([^"]+)"""".r

  /** Extract outgoing links from a listing page (op 48). */
  def extractLinks(html: Array[Byte]): Seq[String] = {
    if (html == null) return Nil
    val s = new String(html, StandardCharsets.UTF_8)
    if (!s.contains("""<ul class="headlines">""")) return Nil
    HrefRe.findAllMatchIn(s).map(_.group(1)).toVector
  }
}
