package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt evaluation — SURVEY.md §2 ops 6/13/49.
  *
  * The robots table (`host, disallow array<string>, crawl_delay double`) is a
  * per-host dim of at most O(#hosts) rows — broadcast it; never shuffle the
  * candidate stream for it.
  *
  * The allow/deny verdict is a pure-Catalyst higher-order function
  * (`exists(disallow, p -> startswith(path, p))`) — no UDF, stays inside
  * whole-stage codegen, and is trivially mirrored in the DuckDB oracle.
  */
object Robots {

  /** Path component of a canonical url ("" for the site root). */
  def pathOf(canonicalUrl: Column): Column =
    regexp_replace(canonicalUrl, "^https://[^/]*", "")

  /** True iff `path` matches any disallow prefix. Null disallow ⇒ allowed. */
  def isDisallowed(path: Column, disallow: Column): Column =
    coalesce(exists(disallow, p => startswith(path, p)), lit(false))

  /** Left-join candidates (must carry `url`, `host`) to the broadcast robots
    * dim and tag each row with `robots_excluded`. Hosts with no robots row
    * are allowed (crawler convention). */
  def tag(candidates: DataFrame, robots: DataFrame): DataFrame =
    candidates
      .join(broadcast(robots.select("host", "disallow")), Seq("host"), "left")
      .withColumn("robots_excluded", isDisallowed(pathOf(col("url")), col("disallow")))
      .drop("disallow")

  /** Pure-Scala flavor for the sequential oracle. */
  def isDisallowedScala(path: String, disallow: Seq[String]): Boolean =
    disallow != null && disallow.exists(p => path.startsWith(p))

  // ---- RFC 9309 evaluator (wildcards, $-anchor, longest-match-wins) ----

  /** Compile one robots rule to its match regex (RFC 9309 §2.2.2/2.2.3):
    * `*` matches any octet sequence, a TRAILING `$` anchors the pattern
    * at the path end, everything else is a literal; a pattern with no
    * `$` is a prefix match. Specificity = the raw pattern's octet length
    * (the RFC's longest-match rule). Runs ONCE per rule when the
    * (broadcast, host-sized) rules dim is built — never per candidate. */
  def compileRule(allow: Boolean, pattern: String): (Boolean, Int, String) = {
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    val rx = "^" + body.split("\\*", -1).map(java.util.regex.Pattern.quote)
      .mkString(".*") + (if (anchored) "$" else "")
    (allow, pattern.length, rx)
  }

  /** RFC 9309 verdict as a pure-Catalyst expression over a per-row
    * `rules` array<struct<allow:boolean, len:int, rx:string>>: keep the
    * rules whose regex matches `path`, then take the array_max of
    * (len, allow) structs — longest pattern wins and, at equal length,
    * the lexicographic struct order makes `allow=true` beat
    * `allow=false`, which IS the RFC tie rule. No matching rule ⇒
    * allowed. Higher-order filter/transform + array_max — no UDF. */
  def isDisallowedRfc(path: Column, rules: Column): Column = {
    val matched = filter(rules, r => regexp_like(path, r.getField("rx")))
    val best = array_max(transform(matched,
      r => struct(r.getField("len").as("len"), r.getField("allow").as("allow"))))
    coalesce(!best.getField("allow"), lit(false))
  }

  /** Left-join candidates (must carry `url`, `host`) to a broadcast
    * RFC-9309 rules dim (`host, rules`) and tag `robots_excluded` —
    * [[tag]]'s shape with the wildcard evaluator. Hosts with no rules
    * row are allowed. */
  def tagRfc(candidates: DataFrame, rules: DataFrame): DataFrame =
    candidates
      .join(broadcast(rules.select("host", "rules")), Seq("host"), "left")
      .withColumn("robots_excluded",
        coalesce(isDisallowedRfc(pathOf(col("url")), col("rules")), lit(false)))
      .drop("rules")

  /** Compile a rule list into the array<struct<allow,len,rx>> literal
    * column the rules dim carries (compiled once, broadcast with it). */
  def rulesArrayColumn(rules: Seq[(Boolean, String)]): Column =
    array(rules.map { case (a, p) =>
      val (_, len, rx) = compileRule(a, p)
      struct(lit(a).as("allow"), lit(len).as("len"), lit(rx).as("rx"))
    }: _*)

  /** Pure-Scala RFC flavor for tests: same compile + longest-match. */
  def isDisallowedRfcScala(path: String, rules: Seq[(Boolean, String)]): Boolean = {
    val matched = rules.map { case (a, p) => compileRule(a, p) }
      .filter { case (_, _, rx) => rx.r.findFirstIn(path).isDefined }
    if (matched.isEmpty) false
    else !matched.maxBy { case (a, len, _) => (len, a) }._1
  }

  /** robots.txt cache-TTL audit (RFC 9309 §2.4: "crawlers SHOULD NOT use
    * the cached version for more than 24 hours") — replay each host's
    * capture timeline against a TTL cache and report what the
    * politeness layer actually paid: a capture at time t triggers a
    * robots refetch iff t − last_fetch ≥ `ttlSec` (the first capture
    * always fetches, and the refetch resets the clock AT t, not on a
    * fixed grid — a host going idle past the TTL refetches on its next
    * capture, whenever that is). Output per host: distinct capture
    * instants, robots fetches paid, the last fetch, and when that cache
    * entry expires — the relation a scheduler joins to decide which
    * hosts need robots refreshed before the next batch.
    *
    * The fetch chain is inherently sequential IN t per host — but
    * per-host only, so the scalable shape is: distinct (host, t)
    * collapse map-side (8-byte epochs, text/html never move), per-host
    * sorted-epoch array as aggregate state (bounded by a host's capture
    * count — the politeness ceiling already caps this), and ONE
    * codegen-planned `aggregate()` fold over it. The oracle replays the
    * same chain as a recursive CTE stepping capture-by-capture. */
  def robotsCacheAudit(captures: DataFrame, ttlSec: Long = 86400L): DataFrame = {
    val init = struct(lit(Long.MinValue / 4).as("last"), lit(0L).as("n"))
    val step = (acc: Column, t: Column) =>
      when(t - acc.getField("last") >= ttlSec,
        struct(t.as("last"), (acc.getField("n") + 1L).as("n")))
        .otherwise(acc)
    captures
      .select(col("host"), col("warc_ts").cast("long").as("t"))
      .distinct()
      .groupBy("host")
      .agg(sort_array(collect_list(col("t"))).as("ts"))
      .select(col("host"), size(col("ts")).cast("long").as("n_captures"),
        aggregate(col("ts"), init, step).as("st"))
      .select(col("host"), col("n_captures"),
        col("st.n").as("n_robots_fetches"),
        col("st.last").as("last_fetch_sec"),
        (col("st.last") + ttlSec).as("cache_expiry_sec"))
  }
}
