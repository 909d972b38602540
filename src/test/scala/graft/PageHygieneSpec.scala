package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Constants, Fixtures}
import graft.operators.PageHygiene
import graft.queries.CrawlQueries

/** Round-5 crawl-hygiene operators: DUST rule mining, rel=canonical
  * collapse, meta-robots gate, soft-404 detection (q178–q181). */
class PageHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = Timestamp.from(Constants.EPOCH.plusSeconds(sec))

  test("dustRules mines the tracking-alias suffix with full support") {
    val rules = PageHygiene
      .dustRules(Fixtures.pages(spark, TestSpark.Sf0001))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // Every doc_id % 5 == 0 article carries a (url, url+AliasSuffix) pair.
    val expected = spark.read
      .parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .filter($"doc_id" % 5 === 0).count()
    assert(rules.contains(Constants.AliasSuffix))
    assert(rules(Constants.AliasSuffix)._1 >= expected)
    // %-escaped aliases are not prefix-shaped: no rule starts with '%'.
    assert(!rules.keys.exists(_.startsWith("%")))
  }

  test("dustRules honors minSupport and pairs only within a host") {
    val pages = Seq(
      // host a: two identical pairs for rule "?x=1" (support 2)
      ("https://a.example.com/p/1", ts(0), "same one", "en"),
      ("https://a.example.com/p/1?x=1", ts(1), "same one", "en"),
      ("https://a.example.com/p/2", ts(2), "same two", "en"),
      ("https://a.example.com/p/2?x=1", ts(3), "same two", "en"),
      // host b: one pair only (support 1 — filtered at minSupport=2)
      ("https://b.example.com/p/3", ts(4), "same three", "en"),
      ("https://b.example.com/p/3?y=9", ts(5), "same three", "en"),
      // cross-host identical content, prefix-shaped urls — never paired
      ("https://a.example.com/q", ts(6), "xhost", "en"),
      ("https://a.example.com.evil.net/q?z", ts(7), "xhost", "en")
    ).toDF("url", "warc_ts", "text", "lang")
    val got = PageHygiene.dustRules(pages, minSupport = 2)
      .as[(String, Long, Long)].collect().toList
    assert(got === List(("?x=1", 2L, 1L)))
    val loose = PageHygiene.dustRules(pages, minSupport = 1)
      .as[(String, Long, Long)].collect()
      .map { case (r, s, h) => r -> ((s, h)) }.toMap
    assert(loose === Map("?x=1" -> ((2L, 1L)), "?y=9" -> ((1L, 1L))))
  }

  test("canonicalHref parses a declared target; canonicalCollapse follows it") {
    val synd = ("https://mirror.example.net/s/7", ts(90),
      ("<html><head><link rel=\"canonical\" href=\"https://o.example.com/articles/7\"/>" +
        "</head><body>b</body></html>").getBytes("UTF-8"))
    val plain = ("https://o.example.com/articles/7?utm=x", ts(30),
      "<html><head><title>t</title></head><body>b</body></html>".getBytes("UTF-8"))
    val base = ("https://o.example.com/articles/7", ts(0),
      "<html><head><title>t</title></head><body>b</body></html>".getBytes("UTF-8"))
    val df = Seq(synd, plain, base).toDF("url", "warc_ts", "html")
    val got = PageHygiene.canonicalCollapse(df)
      .as[(String, Long, Long, Timestamp)].collect().toList
    assert(got === List(("https://o.example.com/articles/7", 3L, 3L, ts(90))))
  }

  test("metaRobotsGate parses directives case-insensitively and tolerates spaces") {
    val mk = (c: String) =>
      s"""<html><head><meta name="robots" content="$c"/></head><body>x</body></html>"""
        .getBytes("UTF-8")
    val df = Seq(
      ("u1", ts(0), mk("noindex, nofollow")),
      ("u2", ts(1), mk("NOINDEX")),
      ("u3", ts(2), mk("nofollow")),
      ("u4", ts(3), "<html><head></head><body>x</body></html>".getBytes("UTF-8"))
    ).toDF("url", "warc_ts", "html")
    val got = PageHygiene.metaRobotsGate(df)
      .as[(String, Timestamp, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got === Map(
      "u1" -> ((true, true)), "u2" -> ((true, false)),
      "u3" -> ((false, true)), "u4" -> ((false, false))))
  }

  test("soft404Flags needs the phrase — short or 404-citing real pages survive") {
    val df = Seq(
      ("err", ts(0), CrawlQueries.Soft404Template),
      ("short", ts(1), "tiny body"),
      ("cites", ts(2),
        ("the server returned 404 yesterday " * 10).trim), // long, code, no phrase
      ("verbose-err", ts(3),
        ("filler words here " * 20).trim + " page not found") // long, phrase, no code
    ).toDF("url", "warc_ts", "text")
    val got = PageHygiene.soft404Flags(df)
      .as[(String, Timestamp, Long, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r._6).toMap
    assert(got === Map(
      "err" -> true, "short" -> false, "cites" -> false, "verbose-err" -> false))
  }

  test("dustApply rewrites, validates, and scores rule precision") {
    val pages = Seq(
      ("https://a.example.com/p/1", ts(0), "same one", "en"),
      ("https://a.example.com/p/1?x=1", ts(1), "same one", "en"),
      ("https://a.example.com/p/2", ts(2), "same two", "en"),
      ("https://a.example.com/p/2?x=1", ts(3), "same two", "en"),
      // matches the mined rule but its stripped target is unknown
      ("https://c.example.com/solo?x=1", ts(4), "uniq", "en")
    ).toDF("url", "warc_ts", "text", "lang")
    val got = PageHygiene.dustApply(pages, minSupport = 2)
      .as[(String, Long, Long, Double)].collect().toList
    assert(got === List(("?x=1", 3L, 2L, 0.6667)))
  }

  test("cdcChunkStats: an edited tail reuses every untouched chunk") {
    val pages = Seq(
      ("https://h.example.com/a", ts(0), "aaaa bb cccc dd", "en"),
      ("https://h.example.com/a", ts(10), "aaaa bb cccc ee", "en")
    ).toDF("url", "warc_ts", "text", "lang")
    // boundaries after 4-char words: chunks = "aaaa" | "bb cccc" | tail
    val got = PageHygiene.cdcChunkStats(pages)
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(got === List(("h.example.com", 6L, 4L, 26L, 11L)))
  }

  test("deadLinkPrune drops edges into flagged targets per origin host") {
    val links = Seq(
      ("h1", "https://t.example.com/articles/1"),
      ("h1", "https://t.example.com/articles/2"),
      ("h2", "https://t.example.com/articles/2")
    ).toDF("host", "link")
    val flags = Seq(
      ("https://t.example.com/articles/2", ts(0), 5L, true, true, true),
      ("https://t.example.com/articles/1", ts(1), 99L, false, false, false)
    ).toDF("url", "warc_ts", "n_words", "has_phrase", "has_code", "soft404")
    val got = PageHygiene.deadLinkPrune(links, flags)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List(("h1", 2L, 1L, 1L), ("h2", 1L, 1L, 0L)))
  }

  test("mirrorClustersFrom elects the min-host rep per component") {
    val pairs = Seq(
      ("a", "b", 3L), ("b", "c", 1L), ("x", "y", 2L)
    ).toDF("host_a", "host_b", "n_shared")
    val got = graft.ml.Corpus.mirrorClustersFrom(pairs)
      .as[(String, String, Long)].collect().sortBy(_._1).toList
    assert(got === List(
      ("a", "a", 3L), ("b", "a", 3L), ("c", "a", 3L),
      ("x", "x", 2L), ("y", "x", 2L)))
  }

  test("fairnessStats: Gini and max-share match hand arithmetic") {
    // counts 1,1,2,4 sorted → i=1..4; Σx=8, Σi·x = 1+2+6+16 = 25
    // gini = 2·25/(4·8) − 5/4 = 1.5625 − 1.25 = 0.3125; max_share = 0.5
    val sched = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(4)("d"))
      .zipWithIndex.map { case (h, i) => (s"u$i", h) }.toDF("url", "host")
    val got = graft.operators.Scheduler.fairnessStats(sched)
      .as[(Long, Long, Double, Double)].collect().toList
    assert(got === List((4L, 8L, 0.5, 0.3125)))
    // perfectly even batch → gini 0
    val even = (1 to 12).map(i => (s"u$i", s"h${i % 4}")).toDF("url", "host")
    val g0 = graft.operators.Scheduler.fairnessStats(even)
      .as[(Long, Long, Double, Double)].head()
    assert(g0 === ((4L, 12L, 0.25, 0.0)))
  }

  test("q180/q181 engine output matches the url-observable injection rule") {
    val dir = TestSpark.Sf0001
    val meta = graft.SparkEntry.queries("q180_meta_robots")(spark, dir)
    val flagged = meta.filter($"noindex").select($"url").as[String].collect()
    assert(flagged.nonEmpty)
    assert(flagged.forall { u =>
      val d = "articles/([0-9]+)".r.findFirstMatchIn(u).map(_.group(1).toLong)
      d.exists(x => x % 17 == 4 || x % 17 == 9)
    })
    val s404 = graft.SparkEntry.queries("q181_soft404")(spark, dir)
    val hit = s404.filter($"soft404").select($"url").as[String].collect()
    assert(hit.nonEmpty)
    assert(hit.forall { u =>
      "articles/([0-9]+)".r.findFirstMatchIn(u).exists(_.group(1).toLong % 19 == 6)
    })
  }

  test("urlFeatureAudit: hand truth across the feature gates") {
    val pages = Seq(
      "https://a.b.example.com/p/1?x=2",           // query + 3-dot host
      "https://ex.com/a/b/c/d",                    // depth 4
      "https://ex.com/%41%42",                     // escapes
      "https://ex.com/" + ("z" * 60) + "123456789" // long + digity
    ).toDF("url")
    val got = PageHygiene.urlFeatureAudit(pages)
      .as[(String, Int, Int, Int, Int, Boolean, Int, Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("https://a.b.example.com/p/1?x=2") ===
      (("https://a.b.example.com/p/1?x=2", 31, 2, 2, 0, true, 3, 1)))
    assert(got("https://ex.com/a/b/c/d") ===
      (("https://ex.com/a/b/c/d", 22, 4, 0, 0, false, 1, 0)))
    assert(got("https://ex.com/%41%42") ===
      (("https://ex.com/%41%42", 21, 1, 4, 2, false, 1, 1)))
    val long = got.keys.find(_.length > 60).get
    val r = got(long)
    assert(r._2 === 84 && r._4 === 9 && r._8 === 2, s"long url row: $r")
  }
}
