package graft.oracle

import scala.collection.mutable

import graft.core.{Canonicalize, Constants, FixtureConstants, Parsers, Priority}
import graft.operators.CrawlConfig

/** Single-threaded pure-Scala crawl oracle — SURVEY.md §5 layer 2.
  *
  * /root/reference was empty at survey time (SURVEY.md §0), so "matching the
  * reference's crawl ordering and URL-seen set" (BASELINE.json north_rule) is
  * realized against THIS frozen implementation: a plain while-loop crawler
  * sharing the exact same pure functions (Canonicalize / Parsers / Priority /
  * Robots rules) as the distributed pipeline, with none of the distribution.
  * The parity tests assert the Spark pipeline reproduces its crawl order
  * (fetch_order sequence) and final seen set exactly, at every parallelism
  * level.
  *
  * No Spark imports — this must stay trivially auditable.
  */
object SequentialCrawler {

  /** A raw page capture (input-table row, html omitted lazily not needed —
    * pass rendered bytes through). */
  final case class PageCap(url: String, warcTsSec: Long, html: Array[Byte],
      text: String, lang: String)

  final case class OracleArticle(url: String, warcTsSec: Long, text: String,
      lang: String, batchId: Long, fetchOrder: Long)

  final case class OracleResult(
      articles: Vector[OracleArticle],
      seen: Map[String, String], // canonical url -> status
      batches: Long)

  def crawl(
      pages: Seq[PageCap],
      seeds: Seq[String],
      cfg: CrawlConfig,
      robots: Map[String, Seq[String]] =
        FixtureConstants.hosts.map(h => h.host -> FixtureConstants.disallowOf(h.host)).toMap,
      weights: Map[String, Double] =
        FixtureConstants.hosts.map(h => h.host -> h.weight).toMap,
      budgets: Map[String, Int] =
        FixtureConstants.hosts.map(h => h.host -> h.budget).toMap,
      crawlDelays: Map[String, Double] =
        FixtureConstants.hosts.map(h => h.host -> h.crawlDelay).toMap): OracleResult = {

    // Captures grouped by canonical url, kept sorted by (warcTs, rawUrl) so
    // "latest capture before the hwm" is a scan.
    val caps = mutable.Map.empty[String, mutable.ArrayBuffer[PageCap]]
    for (p <- pages; canon <- Canonicalize.canonicalScala(p.url))
      caps.getOrElseUpdate(canon, mutable.ArrayBuffer.empty) += p
    caps.values.foreach(b => {
      val sorted = b.sortBy(c => (c.warcTsSec, c.url)); b.clear(); b ++= sorted
    })
    val maxTsSec = if (pages.isEmpty) 0L else pages.map(_.warcTsSec).max

    val epoch = Constants.EPOCH.getEpochSecond
    // frontier: canonical url -> max discovered ts (sec)
    val frontier = mutable.Map.empty[String, Long]
    for (s <- seeds; canon <- Canonicalize.canonicalScala(s))
      frontier(canon) = math.max(frontier.getOrElse(canon, Long.MinValue), epoch)
    val seen = mutable.LinkedHashMap.empty[String, String]
    val articles = Vector.newBuilder[OracleArticle]
    var fetchOrder = 0L

    def hostOf(canon: String): String = Canonicalize.hostScala(canon).getOrElse("")
    def pathOf(canon: String): String = {
      val i = canon.indexOf('/', "https://".length)
      if (i < 0) "" else canon.substring(i)
    }

    var k = 0L
    var done = false
    while (!done && k < cfg.maxBatches) {
      k += 1
      val lo = epoch + (k - 1) * cfg.deltaPerBatchSec
      val hi = lo + cfg.deltaPerBatchSec

      // Δ-scan: captures with lo <= ts < hi (op 1 mirror).
      for {
        (canon, capList) <- caps
        c <- capList if c.warcTsSec >= lo && c.warcTsSec < hi
      } frontier(canon) = math.max(frontier.getOrElse(canon, Long.MinValue), c.warcTsSec)

      // Dedup vs seen (op 12 mirror).
      val candidates = frontier.filterNot { case (u, _) => seen.contains(u) }
      frontier.clear()
      frontier ++= candidates

      // Robots (op 49 mirror): excluded rows become seen and leave.
      val (excluded, allowed) = candidates.partition { case (u, _) =>
        val h = hostOf(u)
        robots.getOrElse(h, Nil).exists(p => pathOf(u).startsWith(p))
      }
      excluded.keys.foreach { u => seen(u) = "excluded"; frontier.remove(u) }

      // Priority + per-host budget (ops 24/25/38 mirror).
      val byHost = allowed.toSeq.groupBy { case (u, _) => hostOf(u) }
      val scheduled = byHost.toSeq.flatMap { case (h, rows) =>
        // crawl_delay cap (ops 25/49 mirror): ⌊Δ-window / delay⌋, min 1 —
        // the exact formula of Scheduler.rankCandidates.
        val delayCap = crawlDelays.get(h).filter(_ > 0)
          .map(d => math.max(1L, math.floor(cfg.deltaPerBatchSec / d).toLong))
          .getOrElse(Long.MaxValue)
        val budget = math.min(budgets.getOrElse(h, 2).toLong * cfg.budgetScale, delayCap).toInt
        rows
          .map { case (u, ts) => (u, ts, Priority.scoreScala(weights.getOrElse(h, 1.0), ts)) }
          .sortBy { case (u, ts, p) => (-p, -ts, u) }(
            Ordering.Tuple3(Ordering.Double.IeeeOrdering, Ordering.Long, Ordering.String))
          .take(budget)
      }

      // Fetch (ops 3/14 mirror): latest capture with ts < hi wins.
      val fetched = scheduled.flatMap { case (u, _, p) =>
        frontier.remove(u)
        caps.get(u).flatMap(_.filter(_.warcTsSec < hi).lastOption) match {
          case Some(cap) => seen(u) = "fetched"; Some((u, cap, p))
          case None => seen(u) = "missing"; None
        }
      }

      // Parse / link-extract (ops 35/47/48 mirror).
      val batchArticles = mutable.ArrayBuffer.empty[(String, PageCap, Double)]
      for ((u, cap, p) <- fetched) {
        val extracted = Parsers.extract(hostOf(u), cap.html)
        if (extracted.isEmpty) {
          for {
            link <- Parsers.extractLinks(cap.html)
            canon <- Canonicalize.canonicalScala(link)
          } frontier(canon) = math.max(frontier.getOrElse(canon, Long.MinValue), cap.warcTsSec)
        } else {
          require(extracted == cap.text, s"byte-identity violated at $u")
          batchArticles += ((u, cap, p))
        }
      }
      for ((u, cap, _) <- batchArticles.sortBy { case (u, _, p) => (-p, u) }(
          Ordering.Tuple2(Ordering.Double.IeeeOrdering, Ordering.String))) {
        fetchOrder += 1
        articles += OracleArticle(u, cap.warcTsSec, cap.text, cap.lang, k, fetchOrder)
      }

      done = (epoch + k * cfg.deltaPerBatchSec > maxTsSec) && frontier.isEmpty
    }
    OracleResult(articles.result(), seen.toMap, k)
  }
}
