package graft.core

import java.nio.charset.StandardCharsets
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.Locale

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
  * EIGHT extractor families with genuinely divergent structure
  * (FIXTURES.md B1; family of a fixture host — 0-5 — is frozen in
  * [[FixtureConstants]]; 6/7 are the round-4 adversarial-structure pair,
  * dispatched via [[extractFamily]] and exercised by
  * CoreSpec/ParserRobustnessSpec):
  *   0 reuters-style     — body inside a marked <div>
  *   1 prnewswire-style  — body inside a marked <p>
  *   2 bloomberg-style   — body inside <section><span>
  *   3 json-ld           — body is the JSON-ESCAPED "articleBody" of an
  *                         application/ld+json script; extraction must
  *                         unescape (\" \\ \uXXXX) to restore bytes
  *   4 segmented         — body split into char-tri-chunks across
  *                         <span data-seg="i"> nodes; extraction rejoins
  *   5 entity-encoded    — '&' → &amp; then ' ' → &#32;; extraction decodes
  *   6 nested-misleading — article div CONTAINS lead/promo divs; extraction
  *                         must depth-match the outer close (the first
  *                         "</div>" is a trap) and strip the inner divs
  *   7 mixed-encoding    — non-ASCII / control chars as hex NCRs, ASCII
  *                         raw; extraction decodes &#x…; and &amp;
  *
  * Round 5 widened the space to FOURTEEN families (the verdict's realistic
  * next shapes; fixture hosts keep their frozen 0-5 families — the new
  * kernels are exercised by the all-family render→extract identity gate
  * q177 over `documents` plus the generated robustness properties):
  *   8 table-in-body     — body char-chunked into <td> cells of a marked
  *                         <table>; a second ("related") table after it is
  *                         a trap; extraction rejoins only the body cells
  *   9 script/style      — inline <script> and <style> blocks INSIDE the
  *                         body div; extraction strips the blocks and keeps
  *                         the surrounding text byte-exact
  *  10 cdata             — body inside <![CDATA[…]]> of an <article> node
  *  11 malformed-attrs   — the body div's tag has unquoted/spaced/quoted
  *                         attributes including a literal '>' inside a
  *                         quoted value; extraction must scan the tag end
  *                         quote-aware (a naive indexOf('>') cuts inside)
  *  12 br-paragraphs     — body chunks joined by <br>/<br/>/<br /> variants
  *                         instead of block tags; extraction removes them
  *  13 double-encoded    — entityEncode applied TWICE on the wire
  *                         (&amp;amp;, &amp;#32;); extraction decodes twice
  *
  * Every article page also carries a published-date <meta> whose FORMAT is
  * family-specific (ISO-ish, RFC-1123-ish with weekday, US slashes, epoch
  * seconds, dotted) — the heterogeneous per-source date parsing the
  * reference does (SURVEY.md §2 op 36), exercised by q15_published_dates.
  *
  * Listing (site-root) pages come in THREE feed formats, host family % 3:
  * HTML <ul>, RSS/Atom-shaped XML, and a JSON feed; [[extractLinks]]
  * dispatches by content sniffing (op 48).
  *
  * Everything is pure Scala (no Spark imports): the pipeline wraps these in
  * a UDF placed AFTER budget-filtering so only scheduled rows pay the parse
  * (SURVEY.md §4 codegen note), the sequential oracle calls them directly.
  */
object Parsers {

  // ------------------------------------------------------------------
  // Published-date formats (family-indexed; None = epoch seconds).
  // ------------------------------------------------------------------

  /** Spark datetime-pattern per family (used by q15's to_timestamp dispatch;
    * family 3 = epoch seconds; family 5's weekday prefix is stripped before
    * parsing because Spark disallows 'E' in parse patterns). */
  val DateFormats: Array[Option[String]] = Array(
    Some("yyyy-MM-dd HH:mm:ss"),
    Some("dd MMM yyyy HH:mm:ss"),
    Some("MM/dd/yyyy HH:mm:ss"),
    None, // epoch seconds
    Some("yyyy.MM.dd HH:mm:ss"),
    Some("EEE, dd MMM yyyy HH:mm:ss"))

  private val dateFormatters: Array[Option[DateTimeFormatter]] =
    DateFormats.map(_.map(p =>
      DateTimeFormatter.ofPattern(p, Locale.US).withZone(java.time.ZoneOffset.UTC)))

  /** Render the published instant in the family's wire format (the date
    * wire-format space has 6 variants; extractor families beyond 5 reuse
    * them cyclically). */
  def formatPublished(family: Int, published: Instant): String =
    dateFormatters(family % dateFormatters.length) match {
      case Some(f) => f.format(published)
      case None => published.getEpochSecond.toString
    }

  // ------------------------------------------------------------------
  // JSON escaping (family 3).
  // ------------------------------------------------------------------

  private[core] def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Unescape a JSON string starting at `from` (just past the opening
    * quote); returns the decoded text, or "" if no closing quote. */
  private def jsonUnescapeTo(s: String, from: Int): String = {
    val b = new StringBuilder
    var i = from
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => return b.toString
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case '"' => b.append('"'); i += 2
            case '\\' => b.append('\\'); i += 2
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'u' if i + 5 < s.length &&
                s.substring(i + 2, i + 6).forall(c => Character.digit(c, 16) >= 0) =>
              // hex-validated: corrupted/truncated \uXXXX escapes (adversarial
              // bytes) must degrade deterministically, never throw.
              b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case other => b.append(other); i += 2
          }
        case c => b.append(c); i += 1
      }
    }
    ""
  }

  // ------------------------------------------------------------------
  // Entity encoding (family 5).
  // ------------------------------------------------------------------

  private[core] def entityEncode(s: String): String =
    s.replace("&", "&amp;").replace(" ", "&#32;")

  private[core] def entityDecode(s: String): String =
    s.replace("&#32;", " ").replace("&amp;", "&")

  // ------------------------------------------------------------------
  // Attribute escaping (family 16): '&' first then '"' on encode, so the
  // decode order '"'-then-'&' is an exact inverse (a literal "&quot;" in
  // the body round-trips via "&amp;quot;", which the quote pass cannot
  // match — no '&' directly precedes its 'q' on the wire).
  // ------------------------------------------------------------------

  private[core] def attrEncode(s: String): String =
    s.replace("&", "&amp;").replace("\"", "&quot;")

  private[core] def attrDecode(s: String): String =
    s.replace("&quot;", "\"").replace("&amp;", "&")

  /** Family 15 page chunk: the chunk text can contain any byte but '<'
    * (the fixture body contract), so `[^<]*` spans newlines exactly. */
  private val PageChunkRe =
    """<div class="page" data-p="(\d+)">([^<]*)</div>""".r

  // ------------------------------------------------------------------
  // Mixed encoding (family 7): printable ASCII stays raw, '&' and every
  // non-printable/non-ASCII UTF-16 unit becomes an uppercase hex NCR.
  // Decoding is a single left-to-right scan ("&amp;" matched before
  // "&#x…;", so a literal "&#x41;" in the body round-trips via
  // "&amp;#x41;"); malformed references pass through verbatim (adversarial
  // bytes degrade deterministically, never throw).
  // ------------------------------------------------------------------

  private[core] def ncrEncode(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => b.append("&amp;")
      case c if c < 0x20 || c > 0x7e => b.append(f"&#x${c.toInt}%X;")
      case c => b.append(c)
    }
    b.toString
  }

  private[core] def ncrDecode(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&' && s.startsWith("&amp;", i)) { b.append('&'); i += 5 }
      else if (s.charAt(i) == '&' && s.startsWith("&#x", i)) {
        val sc = s.indexOf(';', i + 3)
        val hexOk = sc > i + 3 && sc - (i + 3) <= 4 &&
          (i + 3 until sc).forall(j => Character.digit(s.charAt(j), 16) >= 0)
        if (hexOk) { b.append(Integer.parseInt(s.substring(i + 3, sc), 16).toChar); i = sc + 1 }
        else { b.append(s.charAt(i)); i += 1 }
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  // ------------------------------------------------------------------
  // Nested misleading markup (family 6): the article div CONTAINS inner
  // divs (lead + promo), so extraction must depth-match the outer close —
  // a naive scan-to-first-"</div>" cuts at the lead and fabricates text.
  // ------------------------------------------------------------------

  /** Index of the matching `</div>` for a div whose opening tag ends just
    * before `from`; -1 when unbalanced (truncated/corrupt page). */
  private def matchingDivClose(s: String, from: Int): Int = {
    var depth = 1
    var i = from
    while (depth > 0) {
      val open = s.indexOf("<div", i)
      val close = s.indexOf("</div>", i)
      if (close < 0) return -1
      if (open >= 0 && open < close) { depth += 1; i = open + 4 }
      else { depth -= 1; if (depth == 0) return close; i = close + 6 }
    }
    -1
  }

  // ------------------------------------------------------------------
  // Table cells (family 8): fixed-width char-chunking into <td> cells.
  // ------------------------------------------------------------------

  private[core] val CellWidth = 24

  private[core] def cells(body: String): Seq[String] =
    if (body.isEmpty) Seq("")
    else body.grouped(CellWidth).toSeq

  /** Concatenate the `<td>…</td>` cell contents of `inner` left to right;
    * a cell with no intact close delimiter contributes nothing (truncated
    * pages degrade, never fabricate). */
  private def joinCells(inner: String): String = {
    val b = new StringBuilder(inner.length)
    var i = 0
    while (true) {
      val open = inner.indexOf("<td>", i)
      if (open < 0) return b.toString
      val close = inner.indexOf("</td>", open + 4)
      if (close < 0) return b.toString
      b.append(inner.substring(open + 4, close))
      i = close + 5
    }
    b.toString
  }

  // ------------------------------------------------------------------
  // Script/style stripping (family 9): remove <script>…</script> and
  // <style>…</style> spans; an unterminated block truncates the rest
  // (degrade, never fabricate).
  // ------------------------------------------------------------------

  private def stripBlocks(s: String, open: String, close: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (true) {
      val at = s.indexOf(open, i)
      if (at < 0) { b.append(s.substring(i)); return b.toString }
      b.append(s.substring(i, at))
      val end = s.indexOf(close, at + open.length)
      if (end < 0) return b.toString
      i = end + close.length
    }
    b.toString
  }

  // ------------------------------------------------------------------
  // Malformed attributes (family 11): find the true end of a tag whose
  // attributes are unquoted / oddly spaced / contain a quoted '>'.
  // ------------------------------------------------------------------

  /** Index just past the tag-closing '>' scanning from `from`, honoring
    * single- and double-quoted attribute values; -1 if the tag never
    * closes (truncated page). */
  private def tagEnd(s: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    -1
  }

  // ------------------------------------------------------------------
  // Segmented body (family 4): char-based tri-chunking, byte-exact rejoin.
  // ------------------------------------------------------------------

  private[core] def segments(body: String): Seq[String] = {
    if (body.isEmpty) Seq("")
    else {
      val n = body.length
      val cut1 = n / 3
      val cut2 = 2 * n / 3
      Seq(body.substring(0, cut1), body.substring(cut1, cut2), body.substring(cut2))
    }
  }

  // ------------------------------------------------------------------
  // Article rendering / extraction.
  // ------------------------------------------------------------------

  private def head(title: String, published: String, tickers: Seq[String]): String = {
    val tick =
      if (tickers.isEmpty) ""
      else s"""<meta property="article:tickers" content="${tickers.mkString(",")}"/>"""
    s"""<head><title>$title</title>""" +
      s"""<meta property="article:published" content="$published"/>$tick</head>"""
  }

  /** Render an article page for (family, title, source, body, published) →
    * UTF-8 bytes. Bodies in the fixture corpus never contain '<'.
    * `tickers` (entity metadata the reference's feeds attach per article)
    * lands in a head <meta> — never in the extracted body text. */
  def renderArticle(family: Int, title: String, source: String, body: String,
      published: Instant = Constants.EPOCH,
      tickers: Seq[String] = Nil): Array[Byte] = {
    val h = head(title, formatPublished(family, published), tickers)
    val page = family match {
      case 0 =>
        s"""<html>$h<body><div class="ArticleBody">$body</div>""" +
          s"""<footer>© $source</footer></body></html>"""
      case 1 =>
        s"""<html>$h<body><article><p class="pr-body">$body</p></article>""" +
          s"""<div id="footer">Contact</div></body></html>"""
      case 2 =>
        s"""<html>$h<body><section data-component="body"><span>$body</span>""" +
          s"""</section></body></html>"""
      case 3 =>
        s"""<html>$h<body><script type="application/ld+json">""" +
          s"""{"@context":"https://schema.org","@type":"NewsArticle",""" +
          s""""headline":"${jsonEscape(title)}","publisher":"${jsonEscape(source)}",""" +
          s""""articleBody":"${jsonEscape(body)}"}</script>""" +
          s"""<noscript>enable js</noscript></body></html>"""
      case 4 =>
        val segs = segments(body).zipWithIndex
          .map { case (seg, i) => s"""<span data-seg="$i">$seg</span>""" }.mkString
        s"""<html>$h<body><div id="story-body">$segs</div>""" +
          s"""<aside>related: $source</aside></body></html>"""
      case 5 =>
        s"""<html>$h<body><div class="entity-body">${entityEncode(body)}</div>""" +
          s"""</body></html>"""
      case 6 =>
        s"""<html>$h<body><div data-role="article">""" +
          s"""<div class="lead">Summary: $title</div>$body""" +
          s"""<div class="promo">more from $source</div></div>""" +
          s"""<div class="comments">0 comments</div></body></html>"""
      case 7 =>
        s"""<html>$h<body><div class="mixed-body">${ncrEncode(body)}</div>""" +
          s"""</body></html>"""
      case 8 =>
        val rows = cells(body).grouped(3)
          .map(r => "<tr>" + r.map(c => s"<td>$c</td>").mkString + "</tr>")
          .mkString
        s"""<html>$h<body><table class="body-table">$rows</table>""" +
          s"""<table class="related"><tr><td>more from $source</td></tr>""" +
          s"""</table></body></html>"""
      case 9 =>
        val segs = segments(body) // Seq("") for an empty body — pad to 3
        val (a, b, c) = (segs.head, segs.lift(1).getOrElse(""), segs.lift(2).getOrElse(""))
        s"""<html>$h<body><div class="scripted-body">$a""" +
          s"""<script>var t=1;track("$source");</script>$b""" +
          s"""<style>.promo{display:none}</style>$c</div></body></html>"""
      case 10 =>
        s"""<html>$h<body><article id="cdata-body"><![CDATA[$body]]>""" +
          s"""</article></body></html>"""
      case 11 =>
        s"""<html>$h<body><div class=mal-body id = "b-1" data-q='a > b' >""" +
          s"""$body</div></body></html>"""
      case 12 =>
        val segs = segments(body) // Seq("") for an empty body — pad to 3
        val (a, b, c) = (segs.head, segs.lift(1).getOrElse(""), segs.lift(2).getOrElse(""))
        s"""<html>$h<body><div class="br-body">$a<br>$b<br/>$c<br />""" +
          s"""</div></body></html>"""
      case 13 =>
        s"""<html>$h<body><div class="dbl-body">""" +
          entityEncode(entityEncode(body)) + s"""</div></body></html>"""
      case 14 =>
        // Comment-trap body: ad-slot comments interleave the text and one
        // comment CONTAINS a fake "</div>" — a scan-to-first-close without
        // comment stripping cuts inside the comment and fabricates text.
        val segs = segments(body)
        val (a, b, c) = (segs.head, segs.lift(1).getOrElse(""), segs.lift(2).getOrElse(""))
        s"""<html>$h<body><div class="cmt-body"><!-- ad:top -->$a""" +
          s"""<!-- trap </div><div class="promo"> -->$b""" +
          s"""<!-- tracker:$source -->$c</div></body></html>"""
      case 15 =>
        // Out-of-order pagination: the three page divs are emitted in
        // REVERSED data-p order (lazy-loaded "continued" chunks); the
        // parser must reassemble by index, and document order fabricates.
        val segs = segments(body)
        val pages = segs.zipWithIndex.reverse.map { case (seg, i) =>
          s"""<div class="page" data-p="$i">$seg</div>"""
        }.mkString
        s"""<html>$h<body><div class="paged-body">$pages</div></body></html>"""
      case 16 =>
        // Attribute-embedded body (AMP/meta-tag style): the full text lives
        // in a data attribute with HTML attribute escaping (& then ").
        s"""<html>$h<body><div class="attr-body" data-content="${attrEncode(body)}">""" +
          s"""</div><div class="shell">app shell</div></body></html>"""
      case _ =>
        // SPA state blob: the article rides a JSON script as base64 —
        // the modern "hydration payload" page whose visible DOM is empty.
        val b64 = java.util.Base64.getEncoder
          .encodeToString(body.getBytes(StandardCharsets.UTF_8))
        s"""<html>$h<body><div id="root"></div>""" +
          s"""<script id="__STATE__" type="application/json">""" +
          s"""{"page":{"body64":"$b64","src":"${jsonEscape(source)}"}}""" +
          s"""</script></body></html>"""
    }
    page.getBytes(StandardCharsets.UTF_8)
  }

  /** Listing feed format of a host (op 1's RSS/JSON/HTML endpoint variety). */
  def listingFormatOf(host: String): Int = FixtureConstants.familyOf(host) % 3

  /** Render a listing (site-root) page linking to `urls` → UTF-8 bytes.
    * Format 0 = HTML <ul>, 1 = RSS-shaped XML, 2 = JSON feed. */
  def renderListing(host: String, urls: Seq[String]): Array[Byte] = {
    val page = listingFormatOf(host) match {
      case 0 =>
        val items = urls.map(u => s"""<li><a href="$u">$u</a></li>""").mkString
        s"""<html><head><title>$host</title></head><body><ul class="headlines">""" +
          items + "</ul></body></html>"
      case 1 =>
        val items = urls.map(u => s"""<item><title>$u</title><link>$u</link></item>""").mkString
        s"""<?xml version="1.0" encoding="UTF-8"?><rss version="2.0"><channel>""" +
          s"""<title>$host</title>$items</channel></rss>"""
      case _ =>
        val items = urls.map(u => s"""{"id":"$u","url":"$u"}""").mkString(",")
        s"""{"version":"https://jsonfeed.org/version/1.1","title":"$host","items":[$items]}"""
    }
    page.getBytes(StandardCharsets.UTF_8)
  }

  /** (start-marker, end-marker) searched by the simple-wrapper families. */
  private val markers: Array[(String, String)] = Array(
    ("""<div class="ArticleBody">""", """</div>"""),
    ("""<p class="pr-body">""", """</p>"""),
    ("""<section data-component="body"><span>""", """</span>"""))

  private def between(s: String, start: String, end: String): Option[String] = {
    val i = s.indexOf(start)
    if (i < 0) None
    else {
      val from = i + start.length
      val j = s.indexOf(end, from)
      if (j < 0) None else Some(s.substring(from, j))
    }
  }

  private val SegRe = """<span data-seg="\d+">""".r

  /** Extract article text from page bytes for a host; "" when the page has
    * no article body (e.g. listing pages). THE byte-identity contract. */
  def extract(host: String, html: Array[Byte]): String =
    extractFamily(FixtureConstants.familyOf(host), html)

  /** Number of extractor families ([[renderArticle]]/[[extractFamily]]). */
  val NumFamilies: Int = 18

  /** Family-explicit extraction — the per-site parser kernels themselves.
    * Hosts outside the fixture dim dispatch here through
    * `FixtureConstants.familyOf`; families 6/7 (nested misleading markup,
    * mixed-encoding NCRs) are the adversarial-structure pair exercised by
    * CoreSpec/ParserRobustnessSpec. */
  def extractFamily(family: Int, html: Array[Byte]): String = {
    if (html == null) return ""
    val s = new String(html, StandardCharsets.UTF_8)
    family match {
      case f if f >= 0 && f <= 2 =>
        val (start, end) = markers(f)
        between(s, start, end).getOrElse("")
      case 3 =>
        val key = """"articleBody":""""
        val i = s.indexOf(key)
        if (i < 0) "" else jsonUnescapeTo(s, i + key.length)
      case 4 =>
        between(s, """<div id="story-body">""", """</div>""") match {
          case None => ""
          case Some(inner) =>
            val parts = SegRe.split(inner)
            // parts(0) is empty (inner starts with a seg span); each later
            // part ends with the closing </span>.
            parts.iterator.drop(1).map(_.stripSuffix("</span>")).mkString
        }
      case 5 =>
        between(s, """<div class="entity-body">""", """</div>""")
          .map(entityDecode).getOrElse("")
      case 6 =>
        // Depth-match the article div's close (inner divs make the first
        // "</div>" a trap), then strip the depth-matched lead prefix and
        // the promo suffix. Any structural miss degrades to "".
        val open = """<div data-role="article">"""
        val i = s.indexOf(open)
        if (i < 0) return ""
        val from = i + open.length
        val close = matchingDivClose(s, from)
        if (close < 0) return ""
        val inner = s.substring(from, close)
        val lead = """<div class="lead">"""
        if (!inner.startsWith(lead)) return ""
        val leadClose = matchingDivClose(inner, lead.length)
        if (leadClose < 0) return ""
        val afterLead = inner.substring(leadClose + "</div>".length)
        val promoAt = afterLead.lastIndexOf("""<div class="promo">""")
        if (promoAt < 0 || !afterLead.endsWith("</div>")) return ""
        afterLead.substring(0, promoAt)
      case 7 =>
        between(s, """<div class="mixed-body">""", """</div>""")
          .map(ncrDecode).getOrElse("")
      case 8 =>
        // only the marked body table's cells; the trailing "related" table
        // sits outside the between() span and never contributes.
        between(s, """<table class="body-table">""", """</table>""")
          .map(joinCells).getOrElse("")
      case 9 =>
        between(s, """<div class="scripted-body">""", """</div>""")
          .map(inner => stripBlocks(
            stripBlocks(inner, "<script>", "</script>"), "<style>", "</style>"))
          .getOrElse("")
      case 10 =>
        between(s, """<article id="cdata-body"><![CDATA[""", """]]>""")
          .getOrElse("")
      case 11 =>
        // quote-aware tag-end scan: the data-q value contains a literal
        // '>', so indexOf('>') lands inside the tag and fabricates text.
        val open = """<div class=mal-body"""
        val i = s.indexOf(open)
        if (i < 0) return ""
        val from = tagEnd(s, i + open.length)
        if (from < 0) return ""
        val close = s.indexOf("</div>", from)
        if (close < 0) "" else s.substring(from, close)
      case 12 =>
        between(s, """<div class="br-body">""", """</div>""")
          .map(_.replace("<br />", "").replace("<br/>", "").replace("<br>", ""))
          .getOrElse("")
      case 13 =>
        between(s, """<div class="dbl-body">""", """</div>""")
          .map(t => entityDecode(entityDecode(t))).getOrElse("")
      case 14 =>
        // Strip comments FIRST, then cut at the (now-unambiguous) close:
        // the trap comment's "</div>" disappears with the comment; an
        // unterminated comment (truncation) drops the tail and the close
        // marker with it — all-or-nothing, never a fabricated prefix.
        val open = """<div class="cmt-body">"""
        val i = s.indexOf(open)
        if (i < 0) return ""
        val cleaned = stripBlocks(s.substring(i + open.length), "<!--", "-->")
        val close = cleaned.indexOf("</div>")
        if (close < 0) "" else cleaned.substring(0, close)
      case 15 =>
        // Reassemble by data-p index; REQUIRE the full index set 0..2 so a
        // truncated page (a missing or cut chunk) degrades to "", never to
        // a reordered partial body.
        val found = PageChunkRe.findAllMatchIn(s)
          .map(m => m.group(1).toInt -> m.group(2)).toVector
        if (found.map(_._1).sorted == Seq(0, 1, 2))
          found.sortBy(_._1).map(_._2).mkString
        else ""
      case 16 =>
        between(s, """<div class="attr-body" data-content="""", "\">")
          .map(attrDecode).getOrElse("")
      case _ =>
        between(s, """"body64":"""", "\"").map { b64 =>
          try new String(java.util.Base64.getDecoder.decode(b64),
            StandardCharsets.UTF_8)
          catch { case _: IllegalArgumentException => "" } // corrupt payload
        }.getOrElse("")
    }
  }

  private val HrefRe = """href="([^"]+)"""".r
  private val RssLinkRe = """<link>([^<]+)</link>""".r
  private val JsonUrlRe = """"url":"([^"]+)"""".r

  /** Extract outgoing links from a listing page (op 48), dispatching on the
    * feed format by content sniffing: XML-prologue → RSS <link>s, JSON
    * object → feed items' "url"s, else HTML <ul class="headlines"> hrefs.
    * Article pages (incl. JSON-LD articles, which start with <html>) yield
    * no links. */
  def extractLinks(html: Array[Byte]): Seq[String] = {
    if (html == null) return Nil
    val s = new String(html, StandardCharsets.UTF_8)
    if (s.startsWith("<?xml")) RssLinkRe.findAllMatchIn(s).map(_.group(1)).toVector
    else if (s.startsWith("{")) JsonUrlRe.findAllMatchIn(s).map(_.group(1)).toVector
    else if (s.contains("""<ul class="headlines">""")) HrefRe.findAllMatchIn(s).map(_.group(1)).toVector
    else Nil
  }
}
