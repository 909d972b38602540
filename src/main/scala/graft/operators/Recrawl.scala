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

  /** Snapshot CDC (op 92): per-canonical-url change status between two
    * crawl snapshots — the diff a crawl operator runs after every batch
    * window ("what did this crawl add or change?"). The OLD snapshot is
    * every capture at or before `boundary`; the NEW snapshot is the full
    * capture log. Status per url:
    *   - 'added'     — no capture at or before the boundary
    *   - 'changed'   — latest-capture content differs across the boundary
    *   - 'unchanged' — latest capture's content hash is the same
    * ('removed' cannot be observed in an append-only capture log — a
    * url's absence from the new window is indistinguishable from "not
    * recrawled yet"; a frontier-level tombstone feed would supply it.)
    *
    * Content comparison is on xxhash64(text) — the q85 capture-index
    * trade (an 8-byte hash shuffles, the text column never does; a
    * 64-bit collision can misreport one url as unchanged, never corrupt
    * other rows). Latest-capture selection is max(struct(ts, hash)):
    * max ignores the NULLed-out rows on the old side and orders by ts
    * first (hash breaks exact-ts ties deterministically). Plan: map-side
    * canonicalize + hash → ONE hash agg on url — same scale shape as
    * changeStats. */
  def snapshotDiff(pages: DataFrame, boundary: java.sql.Timestamp): DataFrame =
    pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(
        Canonicalize.canonicalUrl(col("url")).as("url"),
        col("warc_ts"),
        xxhash64(col("text")).as("text_h"))
      .filter(col("url").isNotNull)
      .groupBy("url")
      .agg(
        max(when(col("warc_ts") <= lit(boundary),
          struct(col("warc_ts"), col("text_h")))).as("old_last"),
        max(struct(col("warc_ts"), col("text_h"))).as("new_last"),
        sum(when(col("warc_ts") <= lit(boundary), 0L).otherwise(1L))
          .as("n_new_captures"))
      .select(
        col("url"),
        when(col("old_last").isNull, lit("added"))
          .when(col("old_last.text_h") =!= col("new_last.text_h"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("n_new_captures"),
        col("new_last.warc_ts").as("last_ts"))

  /** Due-for-recrawl frontier feed (op 93): the urls whose adaptive
    * revisit interval (changeStats, op 92's sibling q85) has elapsed at
    * `now` — the list a scheduler unions into the next batch's candidate
    * set. overdue_sec orders the backlog (most-stale first is the
    * classic freshness-maximizing policy). Pure composition: changeStats'
    * single hash agg + a filter; nothing new shuffles. */
  def dueForRecrawl(pages: DataFrame, now: java.sql.Timestamp,
      defaultRevisitSec: Long = 86400L): DataFrame = {
    val nowSec = now.toInstant.getEpochSecond
    changeStats(pages, defaultRevisitSec)
      .withColumn("due_at_sec", unix_timestamp(col("last_ts")) + col("revisit_sec"))
      .filter(col("due_at_sec") <= nowSec)
      .select(
        col("url"), col("n_versions"), col("last_ts"), col("revisit_sec"),
        (lit(nowSec) - col("due_at_sec")).as("overdue_sec"))
  }

  /** Poisson change-rate estimation (Cho & Garcia-Molina, TOIT 2003,
    * "Estimating frequency of change"): the bias-reduced MLE of a page's
    * change rate λ from a capture log that only OBSERVES changes at
    * visit times — the estimator [[changeStats]]'s degenerate span/c
    * policy upgrades to once a url has interval-grain history. With n
    * consecutive-capture intervals of which X showed a content change,
    *   λ̂ = −ln((n − X + 0.5) / (n + 0.5)) / T̄
    * (T̄ = mean interval); the +0.5 terms are the paper's bias correction
    * that keeps X = n finite and X = 0 at exactly λ̂ = 0. The adaptive
    * revisit interval is 1/λ̂ (null when no change was ever observed —
    * the caller's default-backoff regime, cf. [[dueForRecrawl]]).
    *
    * Interval flags need consecutive-capture adjacency, so unlike the
    * span-grain [[changeStats]] this runs one lag window PARTITIONED BY
    * url — per-url frames are retention-bounded (op 98 caps captures per
    * url), never corpus-wide, and only 8-byte hashes + timestamps enter
    * the shuffle (the capture-index trade: text never rides an exchange).
    * Emitted rates are per HOUR: raw per-second λ̂ for a monthly-changing
    * page is ~4e-7 and dies in 6-dp rounding. */
  def poissonChangeRate(pages: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("warc_ts"), col("text_h"))
    pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(
        Canonicalize.canonicalUrl(col("url")).as("url"),
        col("warc_ts"),
        xxhash64(col("text")).as("text_h"))
      .filter(col("url").isNotNull)
      .withColumn("prev_h", lag(col("text_h"), 1).over(w))
      .groupBy("url")
      .agg(
        sum(when(col("prev_h").isNotNull, 1L).otherwise(0L)).as("n_intervals"),
        sum(when(col("prev_h").isNotNull && col("prev_h") =!= col("text_h"), 1L)
          .otherwise(0L)).as("n_changes"),
        (unix_timestamp(max("warc_ts")) - unix_timestamp(min("warc_ts")))
          .as("span_sec"))
      .filter(col("n_intervals") >= 1 && col("span_sec") > 0)
      .withColumn("mean_interval_hours",
        col("span_sec") / (col("n_intervals") * lit(3600.0)))
      .withColumn("lambda_per_hour",
        -log((col("n_intervals") - col("n_changes") + lit(0.5)) /
          (col("n_intervals") + lit(0.5))) / col("mean_interval_hours"))
      .select(
        col("url"), col("n_intervals"), col("n_changes"),
        round(col("mean_interval_hours"), 6).as("mean_interval_hours"),
        round(col("lambda_per_hour"), 6).as("lambda_per_hour"),
        when(col("lambda_per_hour") > 0,
          round(lit(1.0) / col("lambda_per_hour"), 6)).as("recrawl_hours"))
  }

  /** Largest-remainder (Hamilton) crawl-budget apportionment: split an
    * integer global fetch budget across hosts proportionally to an
    * integer weight (here: demand — e.g. frontier backlog or capture
    * volume), exactly. Each host gets floor(total·w/W) plus one extra
    * for the (total − Σfloor) largest remainders (ties: host asc) — the
    * whole-batch counterpart of the per-host politeness CAP: the cap
    * bounds a host, this SPENDS a cluster-wide budget without over- or
    * under-committing it (Σalloc == total exactly, which a rounded
    * proportional split cannot guarantee).
    *
    * All-integer arithmetic (div/mod on longs) → hash-exact across
    * engines. One hash agg feeds a 1-row total (broadcast crossJoin
    * attach) and one rank window on the HOST-dim grain — bounded by
    * host cardinality, the q164 argument; url-grain rows never enter. */
  def allocateBudget(hostWeights: DataFrame, total: Long): DataFrame = {
    require(total >= 0, "budget must be non-negative")
    val tot = hostWeights.agg(sum("weight").as("wsum"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("rem"), col("host"))
    hostWeights
      .crossJoin(broadcast(tot))
      .filter(col("wsum") > 0)
      .select(col("host"), col("weight"),
        expr(s"($total * weight) div wsum").as("base"),
        expr(s"($total * weight) % wsum").as("rem"),
        col("wsum"))
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(
        hostWeights.crossJoin(broadcast(tot)).filter(col("wsum") > 0)
          .agg((lit(total) - sum(expr(s"($total * weight) div wsum")))
            .as("n_extra"))))
      .select(col("host"), col("weight"),
        (col("base") + when(col("rk") <= col("n_extra"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Refresh-policy freshness audit (Cho & Garcia-Molina, "Effective
    * page refresh policies for web crawlers", TODS'03): given each url's
    * estimated Poisson change rate λ̂ ([[poissonChangeRate]]) and a
    * global revisit budget of `totalPerHour` fetches/hour, compare the
    * two canonical allocation policies by EXPECTED steady-state
    * freshness — E[F] for a page with change rate λ revisited every 1/f
    * hours is (f/λ)·(1 − e^(−λ/f)) (and 1 when λ = 0: a page that never
    * changes is always fresh):
    *   - `uniform`:      every url gets f = F/N;
    *   - `proportional`: f_u = F·λ_u/Σλ — "revisit what changes most".
    * Output: one row per policy (policy, n_urls, mean_freshness).
    *
    * The paper's counterintuitive theorem — uniform ≥ proportional —
    * is Jensen's inequality on the convex freshness curve F̄(λ/f), and
    * holds when every page changes (λ > 0): proportional equalizes λ/f
    * corpus-wide, uniform spreads it, and spreading wins on a convex
    * curve. Pages the estimator never saw change (λ̂ = 0) flip the
    * comparison's premise: proportional spends NOTHING on them (they
    * are fresh for free) while uniform burns F/N on each, so a corpus
    * dominated by static pages can grade proportional higher — which
    * is exactly the tell this audit exists to surface (RecrawlSpec
    * pins both regimes against scalar truth).
    *
    * Float discipline: λ enters as the 6-dp-rounded published estimate
    * (oracle-proven equal), Σλ is an EXACT integer sum of the ×1e6
    * fixed-point values, so every per-url (λ, f) operand pair is
    * bit-identical across engines; the only cross-engine wiggle is
    * libm's exp (≤1 ulp, the q05 precedent) and the mean's addition
    * order, both absorbed by the 6-dp output rounding. Shape: one
    * map-stage projection per policy over the rate table + a 1-row
    * broadcast total (constant attach) + one final agg — no windows,
    * nothing driver-side. */
  def refreshPolicyAudit(rates: DataFrame, totalPerHour: Double): DataFrame = {
    require(totalPerHour > 0, "need a positive revisit budget")
    val lam = rates.select(col("url"),
      expr("CAST(round(lambda_per_hour * 1000000, 0) AS BIGINT)").as("lam_e6"))
    val tot = lam.agg(sum("lam_e6").as("w_e6"), count(lit(1)).as("n"))
    def fresh(f: org.apache.spark.sql.Column) = {
      val lamH = col("lam_e6").cast("double") / lit(1000000.0)
      when(col("lam_e6") === 0L, lit(1.0))
        .otherwise(f / lamH * (lit(1.0) - exp(-lamH / f)))
    }
    val withTot = lam.crossJoin(broadcast(tot)).filter(col("w_e6") > 0)
    val uni = withTot
      .select(fresh(lit(totalPerHour) / col("n").cast("double")).as("fr"))
      .agg(count(lit(1)).as("n_urls"), round(avg("fr"), 6).as("mean_freshness"))
      .select(lit("uniform").as("policy"), col("n_urls"), col("mean_freshness"))
    val prop = withTot
      .filter(col("lam_e6") > 0) // f=0 at λ=0: freshness 1, kept below
      .select(fresh(lit(totalPerHour) * col("lam_e6").cast("double") /
        col("w_e6").cast("double")).as("fr"), col("n"))
      .agg(max(col("n")).as("n_all"), count(lit(1)).as("n_pos"),
        sum("fr").as("s"))
      // λ=0 urls get f=0 under proportional but are fresh anyway (E[F]=1)
      .select(lit("proportional").as("policy"), col("n_all").as("n_urls"),
        round((col("s") + (col("n_all") - col("n_pos")).cast("double")) /
          col("n_all").cast("double"), 6).as("mean_freshness"))
    uni.unionByName(prop)
  }

  /** Capture retention (op 98): keep the newest `keepN` captures per
    * canonical url — the WARC-storage retention policy that bounds the
    * capture log's growth under recrawling (the storage-side complement
    * of the seen-set: dedup bounds URL work, retention bounds bytes).
    * Returns the retained rows (url, warc_ts, rank) with rank 1 = newest.
    *
    * The window partitions by the url KEY — its frame is bounded by
    * captures-per-url (tens, by the revisit policy), never the corpus —
    * and orders by (warc_ts desc, content-hash desc): the 8-byte map-side
    * xxhash64 breaks exact-timestamp ties deterministically while page
    * content itself never enters the shuffle (the q85 trade). The oracle
    * orders by warc_ts alone — capture offsets per canonical url are
    * distinct by fixture construction, so the tie-break never fires there. */
  def pruneCaptures(pages: DataFrame, keepN: Int): DataFrame = {
    require(keepN >= 1, "keepN must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url"))
      .orderBy(col("warc_ts").desc, col("text_h").desc)
    pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(
        Canonicalize.canonicalUrl(col("url")).as("url"),
        col("warc_ts"),
        xxhash64(col("text")).as("text_h"))
      .filter(col("url").isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= keepN)
      .select("url", "warc_ts", "rank")
  }

  /** CDX-style revisit records (op 136): flag each capture whose content
    * digest equals the PREVIOUS capture of the same canonical url — the
    * WARC `revisit` record a deduplicating crawl writer emits instead of
    * storing the payload again (Heritrix/wayback CDX dedup: the most
    * recent capture is the comparison point, so an A→A→B→B history
    * yields two revisits — positions 2 and 4). The first capture of a
    * url is never a revisit.
    *
    * Digest is map-side xxhash64(text) — the q85 capture-index trade: an
    * 8-byte key rides the shuffle, page content never does; a 64-bit
    * collision could misflag one capture as a revisit, never corrupt
    * neighbors. The lag window partitions by the url KEY (frame bounded
    * by captures-per-url, never the corpus) and orders by (warc_ts,
    * digest) — the digest tie-break makes exact-ts replays deterministic;
    * the oracle orders by warc_ts alone (capture offsets per canonical
    * url are distinct by fixture construction, the pruneCaptures
    * precedent). Plan at 100 TB: scan → one exchange on url → bounded
    * per-key lag; no joins, no content shuffle. */
  def revisitRecords(pages: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url"))
      .orderBy(col("warc_ts").asc, col("digest").asc)
    pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(
        Canonicalize.canonicalUrl(col("url")).as("url"),
        col("warc_ts"),
        xxhash64(col("text")).as("digest"))
      .filter(col("url").isNotNull)
      .withColumn("is_revisit",
        coalesce(lag(col("digest"), 1).over(w) === col("digest"), lit(false)))
      .select("url", "warc_ts", "is_revisit")
  }

  /** WARC storage-savings audit: per host, how many captures a
    * deduplicating writer stores as lightweight `revisit` records
    * (digest == previous capture of the same canonical url — the
    * [[revisitRecords]] rule) and the byte mass that saves —
    * the capacity-planning number behind running revisit dedup at all.
    *
    * Same shape as revisitRecords: digest AND record length computed
    * MAP-SIDE (content never shuffles; the url-partition window carries
    * 8-byte digests + lengths), then one host-grain hash agg;
    * savings_ratio is one exact division of exactly-summed integers
    * (q140 discipline). */
  def warcSavings(pages: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url"))
      .orderBy(col("warc_ts").asc, col("digest").asc)
    pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(
        Canonicalize.canonicalUrl(col("url")).as("url"),
        col("warc_ts"),
        xxhash64(col("text")).as("digest"),
        octet_length(col("text")).cast("long").as("record_len"))
      .filter(col("url").isNotNull)
      .withColumn("is_revisit",
        coalesce(lag(col("digest"), 1).over(w) === col("digest"), lit(false)))
      .withColumn("host", try_parse_url(col("url"), lit("HOST")))
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_captures"),
        sum(when(col("is_revisit"), lit(1L)).otherwise(lit(0L))).as("n_revisits"),
        sum("record_len").as("bytes_total"),
        sum(when(!col("is_revisit"), col("record_len")).otherwise(lit(0L)))
          .as("bytes_stored"))
      .select(col("host"), col("n_captures"), col("n_revisits"),
        col("bytes_total"), col("bytes_stored"),
        ((col("bytes_total") - col("bytes_stored")).cast("double") /
          col("bytes_total").cast("double")).as("savings_ratio"))
  }

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

  /** CDX byte-offset index (op 142): assign every capture its byte
    * offset inside its (host-keyed) WARC shard file — the lookup index
    * a wayback-style reader needs to seek a record without scanning the
    * shard. Offset = exclusive running sum of record lengths within the
    * shard, in (warc_ts, url) capture order.
    *
    * Scale shape: a per-shard running sum is the textbook case where a
    * plain `sum().over(Window.partitionBy(shard))` funnels the largest
    * shard's every capture through ONE task — instead this rides
    * [[GlobalOrder.withRunningSum]]'s two-phase range-partitioned prefix
    * scan (groups need not be partition-aligned; per-(partition, shard)
    * partials are driver-sized). Record length is the TEXT payload's
    * octet length on both sides (the oracle cannot rebuild html bytes;
    * a production deployment swaps in the stored WARC record length —
    * same plan). */
  def cdxOffsets(pages: DataFrame, parts: Int = 32): DataFrame = {
    val caps = pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(
        Canonicalize.canonicalUrl(col("url")).as("url"),
        col("warc_ts"),
        octet_length(col("text")).cast("long").as("record_len"))
      .filter(col("url").isNotNull)
      .withColumn("shard", try_parse_url(col("url"), lit("HOST")))
    GlobalOrder
      .withRunningSum(caps, "shard", "record_len",
        Seq(col("warc_ts"), col("url")), parts, "cum")
      .select(col("shard"), col("url"), col("warc_ts"), col("record_len"),
        (col("cum") - col("record_len")).as("byte_offset"))
  }

  /** Sitemap-driven recrawl feed: join the parsed sitemap entries
    * ([[Sitemaps.parse]] output: canonical url + announced lastmod) to
    * the crawl's latest capture per canonical url and classify —
    * 'new' (announced, never captured: schedule a first fetch),
    * 'stale' (lastmod after the newest capture: the publisher says the
    * page changed — the freshness loop every production crawler runs
    * off sitemaps), 'fresh' otherwise. One url-grain hash agg over the
    * capture log (timestamps only — content/html never shuffles, the
    * q85 trade) + one equi-join on the canonical url key. */
  def sitemapStale(entries: DataFrame, pages: DataFrame): DataFrame = {
    val latest = pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(Canonicalize.canonicalUrl(col("url")).as("url"), col("warc_ts"))
      .filter(col("url").isNotNull)
      .groupBy("url").agg(max("warc_ts").as("last_capture"))
    entries.select(col("url"), col("lastmod"))
      .join(latest, Seq("url"), "left")
      .select(col("url"), col("lastmod"), col("last_capture"),
        when(col("last_capture").isNull, lit("new"))
          .when(col("lastmod") > col("last_capture"), lit("stale"))
          .otherwise(lit("fresh")).as("status"))
  }

  /** Per-host capture-volume EWMA forecast — the crawl-rate controller's
    * input: how many captures to EXPECT from each host next hour, as an
    * exponentially-weighted moving average of its hourly capture counts
    * (recent hours dominate; alpha is the standard smoothing knob).
    *
    * The recursion s_t = α·x_t + (1−α)·s_{t−1}, s_1 = x_1 is spelled in
    * its CLOSED FORM so both engine and oracle compute identical
    * per-term products with no sequential dependency:
    * s_n = Σ_{t=2..n} α·(1−α)^{n−t}·x_t + (1−α)^{n−1}·x_1.
    *
    * Plan: one (host, hour) hash agg collapses the capture stream
    * (map-side combined); the hour index is a row_number window on that
    * AGGREGATED grain (hours-per-host rows, never captures); one final
    * host-grain agg sums the weighted terms. Float discipline: α and
    * (1−α) are Scala-evaluated and interpolated into the oracle; each
    * term is the left-assoc α·pow(1−α, n−t)·x; only the sum's addition
    * order differs — absorbed by the 6-dp rounding. */
  /** CDX secondary (zipnum-style) block index: every `blockSize`
    * records of a shard's sorted CDX list collapse to one summary row
    * (first key, record count, byte mass) — the block map a wayback-
    * style reader binary-searches BEFORE touching the main index, which
    * is what keeps lookups O(log blocks + blockSize) over a 10^10-row
    * CDX.
    *
    * The in-shard rank rides [[GlobalOrder.withRunningSum]] over a
    * constant-1 column (inclusive prefix count — the same two-phase
    * range-partitioned scan as [[cdxOffsets]], never a per-shard window
    * funneling the largest host through one task); block = (rank−1) div
    * blockSize; the block grain then hash-aggregates. The first record
    * per block is min_by over the rank — deterministic because the rank
    * order IS the (warc_ts, url) CDX order. */
  def cdxBlockIndex(pages: DataFrame, blockSize: Int = 16, parts: Int = 32): DataFrame = {
    require(blockSize >= 1, "need a positive block size")
    val caps = pages
      .filter(Canonicalize.isHttpScheme(col("url")))
      .select(
        Canonicalize.canonicalUrl(col("url")).as("url"),
        col("warc_ts"),
        octet_length(col("text")).cast("long").as("record_len"))
      .filter(col("url").isNotNull)
      .withColumn("shard", try_parse_url(col("url"), lit("HOST")))
      .withColumn("one", lit(1L))
    GlobalOrder
      .withRunningSum(caps, "shard", "one",
        Seq(col("warc_ts"), col("url")), parts, "rk")
      .withColumn("block", expr(s"(rk - 1) div $blockSize"))
      .groupBy("shard", "block")
      .agg(
        min_by(col("warc_ts"), col("rk")).as("first_ts"),
        min_by(col("url"), col("rk")).as("first_url"),
        count(lit(1)).as("n_records"),
        sum("record_len").as("n_bytes"))
      .select(col("shard"), col("block"), col("first_ts"), col("first_url"),
        col("n_records"), col("n_bytes"))
  }

  def volumeForecast(pages: DataFrame, alpha: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    val oneMinus = 1.0 - alpha // Scala-evaluated; oracle interpolates
    val hourly = pages
      .filter(graft.core.Canonicalize.isHttpScheme(col("url")))
      .select(try_parse_url(col("url"), lit("HOST")).as("host"),
        date_trunc("hour", col("warc_ts")).as("hour"))
      .groupBy("host", "hour")
      .agg(count(lit(1)).cast("double").as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("hour"))
    val idx = hourly
      .withColumn("t", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("host"))))
    val term = when(col("t") === 1,
      pow(lit(oneMinus), col("n") - lit(1)) * col("x"))
      .otherwise(lit(alpha) * pow(lit(oneMinus), col("n") - col("t")) * col("x"))
    idx
      .groupBy("host")
      .agg(
        max(col("n")).as("n_hours"),
        max(when(col("t") === col("n"), col("x"))).cast("long").as("last_count"),
        round(sum(term), 6).as("ewma"))
      .select(col("host"), col("n_hours"), col("last_count"), col("ewma"))
  }
}
