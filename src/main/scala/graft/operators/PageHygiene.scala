package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Canonicalize

/** Crawl-hygiene operators over captured pages — round 5 widening of the
  * frontier/dedup surface (SURVEY.md §2 ops 7/12/16 family; the four ops
  * below are the standard production companions of URL canonicalization
  * that the fixed rule table cannot express):
  *
  *  - DUST rule mining (Bar-Yossef, Keidar & Schonfeld, "Do Not Crawl in
  *    the DUST: Different URLs with Similar Text", WWW 2007): LEARN
  *    per-site URL-rewrite rules from observed content-identical URL
  *    pairs, instead of hard-coding them. Mined rules feed the
  *    canonicalizer so future frontier URLs collapse BEFORE fetch.
  *  - `<link rel="canonical">` collapse: publisher-declared canonical
  *    targets (cross-host syndication is the case no URL-string rule can
  *    recover) folded into capture grouping.
  *  - `<meta name="robots">` gate: page-level noindex/nofollow parsed from
  *    the markup — the indexing-side counterpart of robots.txt (op 6/49).
  *  - soft-404 detection: "200 OK" error pages classified from extracted
  *    text features, so dead articles do not pollute the index or the
  *    training corpus.
  *
  * Scale: every shape here is a hash-shuffle on narrow keys. DUST joins on
  * (host, 8-byte content key) — page text never rides the pair shuffle and
  * group sizes are per-host duplicate-cluster sizes; the three page-signal
  * ops are pure map-stage column work (regexp over the already-read html)
  * followed by one keyed agg, so they pipeline inside whole-stage codegen
  * on the same scan the parser dispatch (op 47) already pays for.
  */
object PageHygiene {

  // ------------------------------------------------------------------
  // DUST rule mining
  // ------------------------------------------------------------------

  /** Mine suffix-rewrite DUST rules from content-identical URL pairs.
    *
    * Within each (host, content) group, every strict-prefix URL pair
    * (u, u+s) votes for the rule "strip suffix s"; rules with at least
    * `minSupport` independent pair votes survive. The fixture's tracking
    * aliases (`?utm_source=feed&utm_campaign=x#frag`, FIXTURES.md B1)
    * are exactly such pairs, while its %-escaped aliases are NOT
    * prefix-shaped and exercise the negative side.
    *
    * Content identity travels as (xxhash64(text), length(text)) — an
    * 8+4-byte key, not the text itself — so the pair join shuffles only
    * URLs. Output is hash-free and oracle-expressible (group by text in
    * SQL ≡ group by content key absent 64-bit collisions, the same
    * contract as exact dedup q30).
    */
  def dustRules(pages: DataFrame, minSupport: Int = 2): DataFrame = {
    val rows = pages
      .select(
        Canonicalize.hostOf(col("url")).as("host"),
        col("url"),
        xxhash64(col("text")).as("ck"),
        length(col("text")).as("cl"))
      .distinct()
    val pairs = rows.as("a")
      .join(
        rows.as("b"),
        col("a.host") === col("b.host") && col("a.ck") === col("b.ck") &&
          col("a.cl") === col("b.cl") && col("a.url") < col("b.url"))
      .filter(col("b.url").startsWith(col("a.url")))
      .select(
        col("a.host").as("host"),
        col("b.url").substr(length(col("a.url")) + 1, length(col("b.url")))
          .as("rule_suffix"))
    pairs
      .groupBy(col("rule_suffix"))
      .agg(
        count(lit(1)).as("support"),
        countDistinct(col("host")).as("n_hosts"))
      .filter(col("support") >= minSupport)
  }

  /** Apply mined DUST rules to the URL universe — the second half of the
    * DUST loop (mine → validate → rewrite before fetch). Every distinct
    * URL ending in a mined suffix rewrites to its stripped spelling; a
    * rewrite whose target is itself a known URL is a saved fetch. The
    * per-rule precision (saved/rewritten) is the paper's rule-validation
    * signal — low-precision coincidence rules are dropped before
    * deployment.
    *
    * Plan: the mined rule table is model-sized (support-thresholded), so
    * the suffix match broadcasts rules into a nested-loop probe over the
    * URL scan — O(|urls|·|rules|) with constant |rules| is the
    * scale-correct shape for a non-equi dim probe (the q34 pin forbids
    * ACCIDENTAL BNLJs, not a deliberate constant-size one). The
    * saved-check is one equi-join back to the distinct URL set. */
  def dustApply(pages: DataFrame, minSupport: Int = 2): DataFrame = {
    val rules = dustRules(pages, minSupport).select("rule_suffix")
    val urls = pages.select(col("url")).distinct()
    val m = urls
      .join(broadcast(rules), col("url").endsWith(col("rule_suffix")))
      .select(
        col("rule_suffix"),
        col("url").substr(lit(1), length(col("url")) - length(col("rule_suffix")))
          .as("rewritten"))
    val targets = urls.select(col("url").as("rewritten")).withColumn("hit", lit(1))
    m.join(targets, Seq("rewritten"), "left")
      .groupBy("rule_suffix")
      .agg(count(lit(1)).as("n_rewritten"), count(col("hit")).as("n_saved"))
      .withColumn("rule_precision",
        round(col("n_saved").cast("double") / col("n_rewritten"), 4))
  }

  // ------------------------------------------------------------------
  // content-defined chunk dedup
  // ------------------------------------------------------------------

  /** Content-defined chunk dedup stats — the web-archive storage shape of
    * LBFS/FastCDC applied to extracted text. Chunk boundaries are a pure
    * function of local content (here: after any word whose length % 4 ==
    * 0 — an oracle-expressible stand-in for a Rabin rolling-hash cut; the
    * native `rolling_hash` expression is the byte-grain production
    * variant), so an edit shifts only its own chunk frame and downstream
    * chunks still dedup — recaptures share every chunk except the edited
    * tail. Dedup grain is per host (the storage-shard grain).
    *
    * Plan: the only window is pos-ordered INSIDE one capture (the q119
    * gaps-and-islands shape — never a corpus-wide frame); chunk identity
    * then shuffles as (xxhash64, length) so chunk text never rides the
    * wide exchange (the q30 contract); two hash aggs finish it. */
  def cdcChunkStats(pages: DataFrame): DataFrame = {
    val words = pages
      .filter(length(col("text")) > 0)
      .select(
        col("url"), col("warc_ts"),
        Canonicalize.hostOf(col("url")).as("host"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    val w = Window.partitionBy(col("url"), col("warc_ts")).orderBy(col("pos"))
    val flag = (length(col("word")) % 4 === 0).cast("int")
    val chunks = words
      .withColumn("chunk_id", sum(flag).over(w) - flag)
      .groupBy(col("host"), col("url"), col("warc_ts"), col("chunk_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("word")))),
          x => x.getField("word")), " ").as("chunk"))
    chunks
      .select(col("host"),
        xxhash64(col("chunk")).as("ck"), length(col("chunk")).as("cl"))
      .groupBy("host", "ck", "cl")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("host")
      .agg(
        sum("cnt").as("n_chunks"),
        count(lit(1)).as("n_unique_chunks"),
        sum(col("cnt") * col("cl")).as("chunk_chars"),
        sum((col("cnt") - 1) * col("cl")).as("dup_chars_saved"))
  }

  // ------------------------------------------------------------------
  // dead-link pruning
  // ------------------------------------------------------------------

  /** Drop frontier links whose target is a detected soft-404 (a crawler
    * that keeps fetching "200 OK" error pages re-discovers them forever).
    * `links` is the op-48 edge relation (host, link); `flags` is
    * [[soft404Flags]] output — any flagged capture of a target URL kills
    * the edge. Per origin host: kept vs pruned. Plan: the dead set is a
    * distinct-url projection joined once; at scale it rides hash keys
    * like the seen set (op 12). */
  def deadLinkPrune(links: DataFrame, flags: DataFrame): DataFrame = {
    val dead = flags.filter(col("soft404"))
      .select(col("url").as("link")).distinct()
      .withColumn("dead", lit(1))
    links
      .join(dead, Seq("link"), "left")
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_links"),
        count(col("dead")).as("n_pruned"),
        (count(lit(1)) - count(col("dead"))).as("n_kept"))
  }

  // ------------------------------------------------------------------
  // rel=canonical collapse
  // ------------------------------------------------------------------

  /** Publisher-declared canonical target parsed from page bytes; null when
    * the page declares none. */
  def canonicalHref(html: Column): Column = {
    val href = regexp_extract(
      decode(html, "UTF-8"),
      """<link rel="canonical" href="([^"]+)"""", 1)
    when(length(href) > 0, href)
  }

  /** Collapse captures onto their effective canonical URL: the declared
    * `<link rel="canonical">` target when present (itself re-canonicalized
    * — publishers emit tracking params too), else the URL-string canonical
    * form (op 7). One hash agg on the canonical key. */
  def canonicalCollapse(pages: DataFrame): DataFrame =
    pages
      .withColumn(
        "eff_url",
        coalesce(
          Canonicalize.canonicalUrl(canonicalHref(col("html"))),
          Canonicalize.canonicalUrl(col("url"))))
      .groupBy(col("eff_url"))
      .agg(
        count(lit(1)).as("n_captures"),
        countDistinct(col("url")).as("n_variants"),
        max(col("warc_ts")).as("last_ts"))
      .select(
        col("eff_url").as("url"),
        col("n_captures"), col("n_variants"), col("last_ts"))

  // ------------------------------------------------------------------
  // meta-robots gate
  // ------------------------------------------------------------------

  /** Comma-separated `<meta name="robots">` directives of a page, parsed
    * case-insensitively from the bytes; empty array when absent. */
  def metaRobotsDirectives(html: Column): Column = {
    val content = regexp_extract(
      decode(html, "UTF-8"),
      """(?i)<meta name="robots" content="([^"]*)"""", 1)
    filter(
      transform(split(lower(content), ","), d => trim(d)),
      d => length(d) > 0)
  }

  /** Page-level robots gate: (url, warc_ts, noindex, nofollow) per capture.
    * `noindex` removes the capture from the index feed (pairs with op 106
    * tombstones); `nofollow` suppresses its links in extraction (op 48). */
  def metaRobotsGate(pages: DataFrame): DataFrame = {
    val d = metaRobotsDirectives(col("html"))
    pages.select(
      col("url"),
      col("warc_ts"),
      array_contains(d, "noindex").as("noindex"),
      array_contains(d, "nofollow").as("nofollow"))
  }

  // ------------------------------------------------------------------
  // soft-404 detection
  // ------------------------------------------------------------------

  /** Feature-based soft-404 score over extracted text: a hard phrase hit
    * counts 2, an error-code token 1, a short body 1; flag at >= 3 (the
    * phrase is necessary, so verbose pages that merely cite a 404 survive).
    * Pure map-stage column math — composes with the quality gates (q38,
    * q133) on the same scan. */
  def soft404Flags(pagesWithText: DataFrame, shortWords: Int = 40): DataFrame = {
    val t = col("text")
    val lowered = lower(t)
    val hasPhrase = instr(lowered, "page not found") > 0
    val hasCode = instr(lowered, "404") > 0
    val nWords = size(split(t, " "))
    val score =
      when(hasPhrase, 2).otherwise(0) +
        when(hasCode, 1).otherwise(0) +
        when(nWords <= shortWords, 1).otherwise(0)
    pagesWithText.select(
      col("url"),
      col("warc_ts"),
      nWords.cast("long").as("n_words"),
      hasPhrase.as("has_phrase"),
      hasCode.as("has_code"),
      (score >= 3).as("soft404"))
  }

  /** Lexical URL-feature audit (the URL-only spam/trap signals of
    * Ntoulas, Najork, Manasse & Fetterly, "Detecting spam web pages
    * through content analysis", WWW'06 §4 — URL length and
    * composition are among their strongest cheap features; also the
    * pre-fetch half of q86's crawl-trap mining): per DISTINCT url the
    * length, path depth, digit/percent-escape counts, query-string
    * flag, subdomain depth, and an integer gate score (long + digity +
    * escaped + query). Pure map stage over the distinct-url dim — no
    * joins, no windows; every output is an integer or boolean, so the
    * relation is hash-exact. */
  def urlFeatureAudit(pages: DataFrame): DataFrame = {
    val u = pages.select(col("url")).distinct()
    val hostp = substring_index(substring_index(col("url"), "://", -1), "/", 1)
    def stripped(re: String) = length(regexp_replace(col("url"), re, ""))
    u.select(col("url"),
      length(col("url")).cast("int").as("url_len"),
      (length(col("url")) - stripped("/") - lit(2)).cast("int").as("path_depth"),
      stripped("[^0-9]").cast("int").as("n_digits"),
      (length(col("url")) - stripped("%")).cast("int").as("n_pct"),
      col("url").contains("?").as("has_query"),
      (length(hostp) - length(regexp_replace(hostp, "\\.", "")))
        .cast("int").as("subdomain_depth"))
      .withColumn("spam_score",
        (when(col("url_len") > 60, 1).otherwise(0) +
          when(col("n_digits") > 6, 1).otherwise(0) +
          when(col("n_pct") > 0, 1).otherwise(0) +
          when(col("has_query"), 1).otherwise(0)).cast("int"))
  }
}
