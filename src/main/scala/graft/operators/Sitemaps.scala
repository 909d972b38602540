package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Canonicalize

/** Sitemap ingestion (SURVEY.md §2 op 138) — the third frontier source
  * next to seed lists and link extraction.
  *
  * Publishers expose `sitemap.xml` (an `<urlset>` of `<url>` entries with
  * `<loc>/<lastmod>/<changefreq>/<priority>`) and, for large sites, a
  * `<sitemapindex>` whose `<sitemap><loc>` children point at the real
  * urlsets. The crawler wants every entry of every urlset REACHABLE from
  * an index as a scheduling-ready frontier candidate: canonicalized loc,
  * parsed lastmod (the recrawl hint), changefreq, priority.
  *
  * Plan shape: pure map + explode over the sitemap rows (regexp field
  * extraction — the op-48 feed-parsing discipline: no XML DOM, no UDF),
  * with ONE left-semi equi-join on sitemap url keys to drop urlsets no
  * index references (stale/orphaned files a webmaster left behind — a
  * real-crawl hygiene rule). At 100 TB the join keys are sitemap urls
  * (tiny vs the corpus) and entries explode map-side; nothing else
  * shuffles. */
object Sitemaps {

  /** `sitemaps(host, url, xml)` → one row per urlset entry reachable from
    * a sitemapindex: (host, url, lastmod, changefreq, priority). */
  def parse(sitemaps: DataFrame): DataFrame = {
    // child refs out of every index document
    val refs = sitemaps
      .filter(col("xml").contains("<sitemapindex"))
      .select(explode(
        expr("regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)")).as("url"))
      .distinct()
    val reachable = sitemaps
      .filter(col("xml").contains("<urlset"))
      .join(refs, Seq("url"), "left_semi")
    val entry = col("entry")
    reachable
      .select(col("host"), explode(
        expr("regexp_extract_all(xml, '<url>(.*?)</url>', 1)")).as("entry"))
      .select(
        col("host"),
        Canonicalize.canonicalUrl(
          regexp_extract(entry, "<loc>([^<]+)</loc>", 1)).as("url"),
        to_timestamp(
          regexp_extract(entry, "<lastmod>([^<]+)</lastmod>", 1),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("lastmod"),
        regexp_extract(entry, "<changefreq>([^<]+)</changefreq>", 1)
          .as("changefreq"),
        regexp_extract(entry, "<priority>([^<]+)</priority>", 1)
          .cast("double").as("priority"))
  }
}
