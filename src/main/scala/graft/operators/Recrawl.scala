package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Canonicalize

/** Recrawl scheduling + URL-space profiling — the two capture-history
  * analyses a crawler runs between batches (SURVEY.md §2 ops 89/90).
  *
  * Both read only the capture log (the pages table), both are a single
  * hash aggregation over map-side-computed keys, and neither ever
  * shuffles page content — the scale shape of every per-URL accounting
  * op in this engine (cf. q08).
  */
object Recrawl {

  /** Per-canonical-url capture/change statistics driving adaptive
    * revisit intervals (the Cho & Garcia-Molina 2003 recrawl-policy
    * inputs): capture count, content-version count, capture span, and
    * the observed mean time-between-changes as the revisit interval.
    *
    * `n_versions` counts DISTINCT xxhash64(text) — the text column never
    * enters the shuffle (8-byte hashes do; the standard capture-index
    * trade: a 64-bit collision undercounts versions by one, it never
    * corrupts dedup). The revisit policy is the degenerate-sample
    * estimator: with c ≥ 1 observed changes over span s, revisit = s div c
    * (the MLE mean change interval); with no observed change the url backs
    * off to `defaultRevisitSec` (a production policy multiplies the
    * CURRENT interval — that state lives in the frontier, not here).
    *
    * Plan: canonicalize + hash map-side → ONE hash agg on url. No joins,
    * no windows; at 100 TB this is a scan + one exchange on the url key. */
  def changeStats(pages: DataFrame, defaultRevisitSec: Long = 86400L): DataFrame =
    pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(
        Canonicalize.canonicalUrl(col("url")).as("url"),
        col("warc_ts"),
        xxhash64(col("text")).as("text_h"))
      .filter(col("url").isNotNull)
      .groupBy("url")
      .agg(
        count(lit(1)).as("n_captures"),
        countDistinct(col("text_h")).as("n_versions"),
        min("warc_ts").as("first_ts"),
        max("warc_ts").as("last_ts"))
      .withColumn("span_sec",
        unix_timestamp(col("last_ts")) - unix_timestamp(col("first_ts")))
      .withColumn("revisit_sec",
        when(col("n_versions") > 1,
          expr("span_sec div (n_versions - 1)"))
          .otherwise(lit(defaultRevisitSec)))

  /** URL-template mining: collapse digit runs to `{N}` and group by
    * (host, path-template) — the crawl-trap / site-structure profile
    * (a template whose distinct-url cardinality explodes is an infinite
    * calendar, a session-id echo, or a faceted-search lattice; flagging
    * it protects the politeness budget from spider traps).
    *
    * Runs on RAW urls (a trap detector must see the url space as
    * discovered, before canonicalization collapses it); the host is the
    * real authority (digits kept — collapsing them would merge distinct
    * hosts). Pure map-side template key → one hash agg. */
  def urlTemplates(pages: DataFrame, trapThreshold: Long = 10L): DataFrame =
    pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(
        Canonicalize.hostOf(col("url")).as("host"),
        regexp_replace(
          regexp_replace(col("url"), "^https?://[^/]+", ""),
          "[0-9]+", "{N}").as("template"),
        col("url").as("raw_url"))
      .groupBy("host", "template")
      .agg(
        countDistinct(col("raw_url")).as("n_urls"),
        count(lit(1)).as("n_captures"))
      .withColumn("is_trap", col("n_urls") >= trapThreshold)
}
