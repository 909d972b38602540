package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Recrawl

/** Recrawl scheduling + URL-template mining (SURVEY.md §2 ops 89/90). */
class RecrawlSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("changeStats: versions, spans, and the revisit policy branches") {
    val pages = Seq(
      // one capture → no signal → default revisit
      ("https://a.example.com/only", ts("2024-01-01 00:00:00"), "t1"),
      // two captures, SAME text → no observed change → default revisit
      ("https://a.example.com/static", ts("2024-01-01 00:00:00"), "s"),
      ("https://a.example.com/static", ts("2024-01-01 01:00:00"), "s"),
      // three captures, three versions → span 7200 div 2 changes = 3600
      ("https://a.example.com/live", ts("2024-01-01 00:00:00"), "v1"),
      ("https://a.example.com/live", ts("2024-01-01 01:00:00"), "v2"),
      ("https://a.example.com/live", ts("2024-01-01 02:00:00"), "v3"),
      // alias captures merge on the CANONICAL url (query dropped)
      ("https://a.example.com/alias", ts("2024-01-01 00:00:00"), "x"),
      ("https://a.example.com/alias?utm=1", ts("2024-01-01 00:10:00"), "y"))
      .toDF("url", "warc_ts", "text")
    val got = Recrawl.changeStats(pages, defaultRevisitSec = 111L)
      .select("url", "n_captures", "n_versions", "span_sec", "revisit_sec")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("https://a.example.com/only", 1L, 1L, 0L, 111L),
      ("https://a.example.com/static", 2L, 1L, 3600L, 111L),
      ("https://a.example.com/live", 3L, 3L, 7200L, 3600L),
      ("https://a.example.com/alias", 2L, 2L, 600L, 600L)))
  }

  test("lateQuarantine: hwm split, lateness arithmetic, observe() metrics") {
    // hwm = epoch + 100 s. Rows at/below it quarantine; later ones pass.
    val epoch = graft.core.Constants.EPOCH
    def at(off: Long) = java.sql.Timestamp.from(epoch.plusSeconds(off))
    val delivery = Seq(
      ("https://a.example.com/x", at(0L)),    // 100 s late
      ("https://a.example.com/y", at(100L)),  // exactly at hwm → late (≤)
      ("https://b.example.com/z", at(101L)))  // on-time, not quarantined
      .toDF("url", "warc_ts")
    val q = graft.operators.Scheduler.lateQuarantine(delivery, 100L)
    val obs = org.apache.spark.sql.Observation()
    val got = q.observe(obs, count(lit(1)).as("n"))
      .select("url", "host", "lateness_sec")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("https://a.example.com/x", "a.example.com", 100L),
      ("https://a.example.com/y", "a.example.com", 0L)))
    assert(obs.get("n") === 2L)
  }

  test("changeStats: text never enters the shuffle (hash-keyed versions)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pages = Seq(("https://a.example.com/p", ts("2024-01-01 00:00:00"), "body"))
        .toDF("url", "warc_ts", "text")
      val exchanges = Recrawl.changeStats(pages).queryExecution.executedPlan
        .collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty)
      // every exchange carries the 8-byte text_h, never the text column
      assert(exchanges.forall(_.output.forall(_.name != "text")),
        exchanges.map(_.output.map(_.name).mkString(",")).mkString("; "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("snapshotDiff: added/changed/unchanged, boundary inclusive, alias merge") {
    val b = ts("2024-01-01 12:00:00")
    val pages = Seq(
      // captured only after the boundary → added
      ("https://a.example.com/new", ts("2024-01-01 13:00:00"), "n1"),
      // revised across the boundary → changed (2 new captures)
      ("https://a.example.com/live", ts("2024-01-01 10:00:00"), "v1"),
      ("https://a.example.com/live", ts("2024-01-01 14:00:00"), "v2"),
      ("https://a.example.com/live", ts("2024-01-01 15:00:00"), "v3"),
      // recaptured after the boundary with the SAME text → unchanged
      ("https://a.example.com/static", ts("2024-01-01 09:00:00"), "s"),
      ("https://a.example.com/static", ts("2024-01-01 16:00:00"), "s"),
      // capture exactly AT the boundary counts as old (inclusive)
      ("https://a.example.com/edge", ts("2024-01-01 12:00:00"), "e"),
      // alias captures merge on the canonical url before the diff:
      // old plain + new tracking-param capture with revised text → changed
      ("https://a.example.com/alias", ts("2024-01-01 08:00:00"), "x"),
      ("https://a.example.com/alias?utm=1", ts("2024-01-01 13:30:00"), "y"))
      .toDF("url", "warc_ts", "text")
    val got = Recrawl.snapshotDiff(pages, b)
      .select("url", "status", "n_new_captures")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("https://a.example.com/new", "added", 1L),
      ("https://a.example.com/live", "changed", 2L),
      ("https://a.example.com/static", "unchanged", 1L),
      ("https://a.example.com/edge", "unchanged", 0L),
      ("https://a.example.com/alias", "changed", 1L)))
  }

  test("dueForRecrawl: observed-interval urls come due; backoff urls do not") {
    val pages = Seq(
      // 2 versions over 2 h → revisit 7200; last 02:00 → due at 04:00
      ("https://a.example.com/live", ts("2024-01-01 00:00:00"), "v1"),
      ("https://a.example.com/live", ts("2024-01-01 02:00:00"), "v2"),
      // same shape but last capture too recent → not due at NOW
      ("https://a.example.com/fresh", ts("2024-01-01 03:00:00"), "f1"),
      ("https://a.example.com/fresh", ts("2024-01-01 05:00:00"), "f2"),
      // unchanged → default 86400 backoff → not due
      ("https://a.example.com/static", ts("2024-01-01 00:00:00"), "s"))
      .toDF("url", "warc_ts", "text")
    val now = ts("2024-01-01 05:00:00") // live due at 04:00 → overdue 3600
    val got = Recrawl.dueForRecrawl(pages, now)
      .select("url", "revisit_sec", "overdue_sec")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("https://a.example.com/live", 7200L, 3600L)))
  }

  test("revisitRecords: lag-digest semantics, alias merge, A-A-B-B pattern") {
    val pages = Seq(
      // A → A → B → B: revisits at positions 2 and 4 (Heritrix dedup)
      ("https://a.example.com/p", ts("2024-01-01 00:00:00"), "A"),
      ("https://a.example.com/p", ts("2024-01-01 01:00:00"), "A"),
      ("https://a.example.com/p", ts("2024-01-01 02:00:00"), "B"),
      ("https://a.example.com/p", ts("2024-01-01 03:00:00"), "B"),
      // alias capture merges onto the canonical url → revisit
      ("https://a.example.com/q", ts("2024-01-01 00:00:00"), "X"),
      ("https://a.example.com/q?utm=1", ts("2024-01-01 00:01:00"), "X"),
      // single capture → never a revisit
      ("https://a.example.com/solo", ts("2024-01-01 00:00:00"), "S"))
      .toDF("url", "warc_ts", "text")
    val got = Recrawl.revisitRecords(pages)
      .as[(String, java.sql.Timestamp, Boolean)].collect().toSet
    assert(got === Set(
      ("https://a.example.com/p", ts("2024-01-01 00:00:00"), false),
      ("https://a.example.com/p", ts("2024-01-01 01:00:00"), true),
      ("https://a.example.com/p", ts("2024-01-01 02:00:00"), false),
      ("https://a.example.com/p", ts("2024-01-01 03:00:00"), true),
      ("https://a.example.com/q", ts("2024-01-01 00:00:00"), false),
      ("https://a.example.com/q", ts("2024-01-01 00:01:00"), true),
      ("https://a.example.com/solo", ts("2024-01-01 00:00:00"), false)))
    // partitioning-stable (window keyed by url, total order within key)
    assert(Recrawl.revisitRecords(pages.repartition(7))
      .as[(String, java.sql.Timestamp, Boolean)].collect().toSet === got)
  }

  test("revisitRecords: text never enters the shuffle (digest-keyed lag)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pages = Seq(("https://a.example.com/p", ts("2024-01-01 00:00:00"), "body"))
        .toDF("url", "warc_ts", "text")
      val exchanges = Recrawl.revisitRecords(pages).queryExecution.executedPlan
        .collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty)
      assert(exchanges.forall(_.output.forall(_.name != "text")),
        exchanges.map(_.output.map(_.name).mkString(",")).mkString("; "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("pruneCaptures: newest-K per canonical url, alias merge, tie ranks") {
    val pages = Seq(
      ("https://a.example.com/x", ts("2024-01-01 00:00:00"), "v1"),
      // alias merges onto the same canonical url before ranking
      ("https://a.example.com/x?utm=1", ts("2024-01-01 01:00:00"), "v2"),
      ("https://a.example.com/x", ts("2024-01-01 02:00:00"), "v3"),
      ("https://a.example.com/y", ts("2024-01-01 00:30:00"), "only"))
      .toDF("url", "warc_ts", "text")
    val got = Recrawl.pruneCaptures(pages, keepN = 2)
      .select("url", "warc_ts", "rank")
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    assert(got === Set(
      ("https://a.example.com/x", ts("2024-01-01 02:00:00"), 1L),
      ("https://a.example.com/x", ts("2024-01-01 01:00:00"), 2L),
      ("https://a.example.com/y", ts("2024-01-01 00:30:00"), 1L)))
    // exact-timestamp ties rank deterministically via the content hash
    val tie = Seq(
      ("https://a.example.com/t", ts("2024-01-01 00:00:00"), "aa"),
      ("https://a.example.com/t", ts("2024-01-01 00:00:00"), "bb"))
      .toDF("url", "warc_ts", "text")
    assert(Recrawl.pruneCaptures(tie, 2).select("rank")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(Recrawl.pruneCaptures(tie.repartition(5), 1).count() === 1L)
  }

  test("urlTemplates: digit collapse, capture grain, trap flag") {
    val rows =
      (1 to 12).map(i => (s"https://t.example.com/cal/2024/$i", "x")) ++ Seq(
        ("https://t.example.com/about", "x"),
        ("https://t.example.com/about", "y"), // recapture: 2 captures, 1 url
        ("https://u2.example.com/item/7?page=3", "x"))
    val pages = rows.toDF("url", "text")
      .withColumn("warc_ts", lit(ts("2024-01-01 00:00:00")))
    val got = Recrawl.urlTemplates(pages, trapThreshold = 10L)
      .select("host", "template", "n_urls", "n_captures", "is_trap")
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      ("t.example.com", "/cal/{N}/{N}", 12L, 12L, true),
      ("t.example.com", "/about", 1L, 2L, false),
      ("u2.example.com", "/item/{N}?page={N}", 1L, 1L, false)))
  }

  test("cdxOffsets: per-shard exclusive prefix sums, alias merge, capture order") {
    val pages = Seq(
      // host a: three captures (one an alias of /p1 — merges onto the
      // canonical url but keeps its own record), lengths 5, 3, 4
      ("https://a.example.com/p1", ts("2024-01-01 00:00:00"), "aaaaa"),
      ("https://a.example.com/p1?utm_source=x", ts("2024-01-01 00:01:00"), "bbb"),
      ("https://a.example.com/p2", ts("2024-01-01 00:02:00"), "cccc"),
      // host b: independent shard, offsets restart at 0
      ("https://b.example.com/q", ts("2024-01-01 00:00:30"), "dd"))
      .toDF("url", "warc_ts", "text")
    val got = graft.operators.Recrawl.cdxOffsets(pages, parts = 3)
      .select("shard", "url", "record_len", "byte_offset")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("a.example.com", "https://a.example.com/p1", 5L, 0L),
      ("a.example.com", "https://a.example.com/p1", 3L, 5L),
      ("a.example.com", "https://a.example.com/p2", 4L, 8L),
      ("b.example.com", "https://b.example.com/q", 2L, 0L)))
  }

  test("redirect resolve: exact hops, loop + over-cap chains unresolved") {
    // a 20-hop chain (c0→…→c20) exceeds the 2^4=16 cap; a 3-cycle; a
    // 2-hop chain; a terminal-sharing pair (both land on /final).
    val chain = (0 until 20).map(i => (s"c$i", s"c${i + 1}"))
    val edges = (chain ++ Seq(
      ("x", "y"), ("y", "final"),
      ("z", "final"),
      ("p", "q"), ("q", "r"), ("r", "p"))).toDF("src", "dst")
    val got = graft.operators.Redirects.resolve(edges, rounds = 4)
      .as[(String, String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("x") === (("final", 2L, "ok")))
    assert(got("y") === (("final", 1L, "ok")))
    assert(got("z") === (("final", 1L, "ok")))
    // chain: c4 is 16 hops from the end — resolves exactly at the cap;
    // c3 (17 hops out) lands on a still-redirecting node → unresolved.
    assert(got("c4") === (("c20", 16L, "ok")))
    assert(got("c0")._3 === "unresolved")
    assert(got("c3") === (("c19", 16L, "unresolved")))
    // 3-cycle: position after exactly 16 steps (16 mod 3 = 1 → next node)
    assert(got("p") === (("q", 16L, "unresolved")))
    assert(got("q") === (("r", 16L, "unresolved")))
    assert(got.size === 26) // every redirecting url resolves to one row
  }

  test("frontierCollapse: aliases collapse onto terminals, loops abandoned, plain urls pass") {
    val edges = Seq(
      ("https://h/old/1", "https://h/articles/1"),          // 1-hop alias
      ("https://h/legacy/2", "https://h/old2/2"),           // 2-hop chain
      ("https://h/old2/2", "https://h/articles/2"),
      ("https://h/a/9", "https://h/b/9"),                   // 2-cycle → abandoned
      ("https://h/b/9", "https://h/a/9")).toDF("src", "dst")
    val frontier = Seq(
      "https://h/articles/1", "https://h/old/1",            // collapse to 2 entries
      "https://h/legacy/2", "https://h/old2/2", "https://h/articles/2", // 3 entries
      "https://h/a/9", "https://h/b/9",                     // dropped
      "https://h/articles/3").toDF("url")                   // plain: passes as itself
    val got = graft.operators.Redirects.frontierCollapse(frontier, edges)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "https://h/articles/1" -> 2L,
      "https://h/articles/2" -> 3L,
      "https://h/articles/3" -> 1L))
  }

  test("warcSavings: per-host revisit byte accounting, exact ratio") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(m * 60L))
    // host a, url /x: A(4 bytes) → A(revisit, 4) → B(3); url /y: C(2).
    val pages = Seq(
      ("https://a.example.com/x", ts(1), "aaaa"),
      ("https://a.example.com/x", ts(2), "aaaa"),
      ("https://a.example.com/x", ts(3), "bbb"),
      ("https://a.example.com/y", ts(4), "cc")).toDF("url", "warc_ts", "text")
    val got = Recrawl.warcSavings(pages)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(got === Array(("a.example.com", 4L, 1L, 13L, 9L, 4.0 / 13.0)))
  }

  test("sitemapStale: new / stale / fresh classification against the capture log") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(m * 60L))
    val pages = Seq(
      ("https://h.example.com/a", ts(10)),
      ("https://h.example.com/a", ts(50)), // newest capture of /a
      ("https://h.example.com/b", ts(20))).toDF("url", "warc_ts")
    val entries = Seq(
      ("https://h.example.com/a", ts(40)), // lastmod before newest capture → fresh
      ("https://h.example.com/b", ts(30)), // lastmod after its only capture → stale
      ("https://h.example.com/c", ts(5))   // never captured → new
    ).toDF("url", "lastmod")
    val got = Recrawl.sitemapStale(entries, pages)
      .as[(String, Timestamp, Option[Timestamp], String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got("https://h.example.com/a") === ((Some(ts(50)), "fresh")))
    assert(got("https://h.example.com/b") === ((Some(ts(20)), "stale")))
    assert(got("https://h.example.com/c") === ((None, "new")))
  }

  test("cdxBlockIndex: block boundaries, first record per block, byte mass") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(m * 60L))
    // one shard, 5 captures, blockSize 2 → blocks of 2, 2, 1 records.
    val pages = Seq(
      ("https://h.example.com/p1", ts(1), "aaaa"),
      ("https://h.example.com/p2", ts(2), "bbb"),
      ("https://h.example.com/p3", ts(3), "cc"),
      ("https://h.example.com/p4", ts(4), "d"),
      ("https://h.example.com/p5", ts(5), "eeeee")).toDF("url", "warc_ts", "text")
    val got = Recrawl.cdxBlockIndex(pages, blockSize = 2)
      .as[(String, Long, Timestamp, String, Long, Long)].collect().sortBy(_._2)
    assert(got === Array(
      ("h.example.com", 0L, ts(1), "https://h.example.com/p1", 2L, 7L),
      ("h.example.com", 1L, ts(3), "https://h.example.com/p3", 2L, 3L),
      ("h.example.com", 2L, ts(5), "https://h.example.com/p5", 1L, 5L)))
  }

  test("volumeForecast == scalar EWMA recursion; single-hour host == its own count") {
    import java.sql.Timestamp
    // host a: hourly counts 4, 1, 2, 3 (gaps in wall-clock hours are
    // fine — EWMA is over the OBSERVED hour sequence); host b: one hour.
    def ts(hour: Int, slot: Int) =
      Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(hour * 3600L + slot * 60L))
    val counts = Seq(4, 1, 2, 3)
    val rows =
      counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => (s"https://a.example.com/p$h$i", ts(h * 2, i))) } ++
        Seq(("https://b.example.com/x", ts(9, 0)), ("https://b.example.com/y", ts(9, 1)))
    val pages = rows.toDF("url", "warc_ts")
    val got = Recrawl.volumeForecast(pages, alpha = 0.3)
      .as[(String, Long, Long, Double)].collect().map(g => g._1 -> g).toMap
    // Scalar recursion s1 = x1; st = 0.3·xt + 0.7·s(t−1).
    val ewmaA = counts.map(_.toDouble).reduceLeft((s, x) => 0.3 * x + 0.7 * s)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = got("a.example.com")
    assert(a._2 === 4L && a._3 === 3L)
    assert(math.abs(a._4 - r6(ewmaA)) < 2e-6, s"ewma ${a._4} vs $ewmaA")
    assert(got("b.example.com") === (("b.example.com", 1L, 2L, 2.0)),
      "single observed hour: EWMA == its own count")
  }

  test("poissonChangeRate: Cho & Garcia-Molina λ̂ vs hand arithmetic") {
    val pages = Seq(
      // single capture → no interval → excluded
      ("https://a.example.com/only", ts("2024-01-01 00:00:00"), "t"),
      // 3 captures, 1 change (v2 repeats): n=2, X=1, T̄=1h
      ("https://a.example.com/live", ts("2024-01-01 00:00:00"), "v1"),
      ("https://a.example.com/live", ts("2024-01-01 01:00:00"), "v2"),
      ("https://a.example.com/live", ts("2024-01-01 02:00:00"), "v2"),
      // 2 captures, no change: λ̂ = −ln(1) = 0 → recrawl null
      ("https://a.example.com/static", ts("2024-01-01 00:00:00"), "s"),
      ("https://a.example.com/static", ts("2024-01-01 02:00:00"), "s"),
      // alias captures merge on the canonical url: n=1, X=1, T̄=600 s
      ("https://a.example.com/alias", ts("2024-01-01 00:00:00"), "x"),
      ("https://a.example.com/alias?utm=1", ts("2024-01-01 00:10:00"), "y"))
      .toDF("url", "warc_ts", "text")
    val got = Recrawl.poissonChangeRate(pages)
      .as[(String, Long, Long, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(
      "https://a.example.com/live", "https://a.example.com/static",
      "https://a.example.com/alias"))
    val live = got("https://a.example.com/live")
    assert((live._2, live._3, live._4) === ((2L, 1L, 1.0)))
    val lamLive = -math.log(1.5 / 2.5) / 1.0
    assert(math.abs(live._5 - lamLive) < 1e-6)
    assert(math.abs(live._6.get - 1.0 / lamLive) < 1e-6)
    val st = got("https://a.example.com/static")
    assert((st._2, st._3, st._5, st._6) === ((1L, 0L, 0.0, None)),
      "no observed change → λ̂ exactly 0, revisit null (default backoff)")
    val al = got("https://a.example.com/alias")
    val lamAlias = -math.log(0.5 / 1.5) / (600.0 / 3600.0)
    assert(math.abs(al._5 - lamAlias) < 1e-6)
  }

  test("allocateBudget: Hamilton apportionment — exact spend, ties, zero weights") {
    def alloc(ws: Seq[(String, Long)], total: Long): Map[String, Long] =
      Recrawl.allocateBudget(ws.toDF("host", "weight"), total)
        .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // quotas 3.5 / 2.1 / 1.4: one extra goes to the largest remainder (a)
    assert(alloc(Seq(("a", 5L), ("b", 3L), ("c", 2L)), 7L) ===
      Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    // remainder tie → host-asc gets the extra
    assert(alloc(Seq(("c", 1L), ("a", 1L), ("b", 1L)), 4L) ===
      Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
    // budget smaller than host count: only the top remainders fetch at all
    assert(alloc(Seq(("a", 1L), ("b", 1L), ("c", 1L)), 2L) ===
      Map("a" -> 1L, "b" -> 1L, "c" -> 0L))
    // zero-weight host never allocates; Σalloc == total in every case
    val z = alloc(Seq(("a", 9L), ("b", 0L), ("c", 1L)), 5L)
    assert(z("b") === 0L && z.values.sum === 5L)
  }

  test("refreshPolicyAudit: scalar truth in both regimes (all-changing vs λ=0 mix)") {
    def audit(rates: Seq[(String, Double)], f: Double): Map[String, (Long, Double)] =
      Recrawl.refreshPolicyAudit(rates.toDF("url", "lambda_per_hour"), f)
        .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def fresh(lam: Double, f: Double): Double =
      if (lam == 0.0) 1.0 else f / lam * (1.0 - math.exp(-lam / f))
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // regime 1 — every page changes: Cho's theorem (uniform ≥ proportional,
    // Jensen on the convex freshness curve; proportional equalizes λ/f).
    val a = audit(Seq(("u1", 0.5), ("u2", 2.0)), 2.0)
    val uniA = (fresh(0.5, 1.0) + fresh(2.0, 1.0)) / 2.0
    val propA = (fresh(0.5, 2.0 * 0.5 / 2.5) + fresh(2.0, 2.0 * 2.0 / 2.5)) / 2.0
    assert(a("uniform") === ((2L, r6(uniA))))
    assert(a("proportional") === ((2L, r6(propA))))
    assert(a("uniform")._2 >= a("proportional")._2, "Cho: uniform wins when all pages change")

    // regime 2 — a λ=0 page in the mix: proportional spends nothing on it
    // (fresh for free) and can flip the comparison; values still exact.
    val b = audit(Seq(("u1", 0.0), ("u2", 0.5), ("u3", 2.0)), 3.0)
    val uniB = (1.0 + fresh(0.5, 1.0) + fresh(2.0, 1.0)) / 3.0
    val propB = (1.0 + fresh(0.5, 3.0 * 0.5 / 2.5) + fresh(2.0, 3.0 * 2.0 / 2.5)) / 3.0
    assert(b("uniform") === ((3L, r6(uniB))))
    assert(b("proportional") === ((3L, r6(propB))))
    assert(b("proportional")._2 > b("uniform")._2, "static pages flip the premise")
  }

  test("mercatorSchedule: back-queue pop order vs hand simulation") {
    // hosts a (delay 2), b (delay 3), c (no delay row → default 1); 2 queues:
    // lexicographic round-robin → a,c → queue 0; b → queue 1.
    val batch = Seq(
      ("u/a1", "a.com", 1), ("u/a2", "a.com", 2), ("u/a3", "a.com", 3),
      ("u/b1", "b.com", 1), ("u/b2", "b.com", 2),
      ("u/c1", "c.com", 1), ("u/c2", "c.com", 2))
      .toDF("url", "host", "host_rank")
    val delays = Seq(("a.com", 2.0), ("b.com", 3.0)).toDF("host", "crawl_delay")
    val got = graft.operators.Scheduler
      .mercatorSchedule(batch, delays, backQueues = 2, defaultDelaySec = 1L, parts = 4)
      .as[(String, String, Int, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    // ready: a1 0, a2 2, a3 4; b1 0, b2 3; c1 0, c2 1
    // pop order (ready, host, rank): a1, b1, c1, c2, a2, b2, a3
    assert(got("u/a1") === ((0, 0L, 1L, 1)))
    assert(got("u/b1") === ((1, 0L, 2L, 1)))
    assert(got("u/c1") === ((0, 0L, 3L, 2)))
    assert(got("u/c2") === ((0, 1L, 4L, 3)))
    assert(got("u/a2") === ((0, 2L, 5L, 4)))
    assert(got("u/b2") === ((1, 3L, 6L, 2)))
    assert(got("u/a3") === ((0, 4L, 7L, 5)))
  }

  test("robotsCacheAudit: TTL replay truth — boundary triggers, idle gaps, dup instants") {
    // ttl = 100 s. host a: t = 0 (fetch), 50 (cached), 100 (== TTL ⇒ fetch),
    // 150 (cached), 400 (idle gap ⇒ fetch) → 3 fetches, last 400, expiry 500.
    // host b: one capture, duplicated instant (distinct collapse) → 1 fetch.
    val caps = Seq(
      ("a", 0L), ("a", 50L), ("a", 100L), ("a", 150L), ("a", 400L),
      ("b", 7L), ("b", 7L))
      .toDF("host", "t")
      .select(col("host"), col("t").cast("timestamp").as("warc_ts"))
    val got = graft.operators.Robots.robotsCacheAudit(caps, ttlSec = 100L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") === ((5L, 3L, 400L, 500L)))
    assert(got("b") === ((1L, 1L, 7L, 107L)))
    // scalar replay parity on a seeded random timeline
    val rnd = new scala.util.Random(11)
    val times = Seq.fill(60)(rnd.nextInt(1000).toLong).distinct.sorted
    val df = times.map(("h", _)).toDF("host", "t")
      .select(col("host"), col("t").cast("timestamp").as("warc_ts"))
    var last = Long.MinValue / 4; var n = 0L
    times.foreach { t => if (t - last >= 100L) { last = t; n += 1 } }
    val r = graft.operators.Robots.robotsCacheAudit(df, ttlSec = 100L)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(r === (("h", times.length.toLong, n, last, last + 100L)))
  }

  test("adaptiveDelayReplay: AIMD branches, cap/floor clamps, scalar parity") {
    // slow=300, init=1000, min=250, max=8000, step=250.
    // host a: lat 500 (→2000, backoff), 500 (→4000), 500 (→8000),
    //         500 (→8000 cap), 100 (→7750 recover)
    val a = Seq((0L, 500L), (10L, 500L), (20L, 500L), (30L, 500L), (40L, 100L))
    // host b: all fast from init → additive decay floors at 250
    val b = Seq.tabulate(6)(i => (i.toLong * 5, 100L))
    val df = (a.map(e => ("a", e._1, e._2)) ++ b.map(e => ("b", e._1, e._2)))
      .toDF("host", "t", "latency_ms")
      .select(col("host"), col("t").cast("timestamp").as("warc_ts"), col("latency_ms"))
    val got = graft.operators.Scheduler.adaptiveDelayReplay(df)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") === ((5L, 4L, 7750L)))
    assert(got("b") === ((6L, 0L, 250L))) // 1000−250·3 = 250, then floored
    // seeded random parity against a scalar controller
    val rnd = new scala.util.Random(5)
    val es = Seq.tabulate(80)(i => (i.toLong, 100L + rnd.nextInt(400).toLong))
    var delay = 1000L; var backs = 0L
    es.foreach { case (_, lat) =>
      if (lat >= 300L) { delay = math.min(delay * 2, 8000L); backs += 1 }
      else delay = math.max(delay - 250L, 250L)
    }
    val rdf = es.map(e => ("h", e._1, e._2)).toDF("host", "t", "latency_ms")
      .select(col("host"), col("t").cast("timestamp").as("warc_ts"), col("latency_ms"))
    val r2 = graft.operators.Scheduler.adaptiveDelayReplay(rdf)
      .as[(String, Long, Long, Long)].collect().head
    assert(r2 === (("h", 80L, backs, delay)))
  }
}
