package graft

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Constants, FixtureConstants, Parsers}

/** Adversarial-input parser robustness (round-3 worklist item 6).
  *
  * The byte-identity contract (extract(host, render(...)) == body) is pinned
  * by CoreSpec on WELL-FORMED pages. This suite feeds the extractor
  * truncated and bit-flipped pages — the real-crawl case of interrupted
  * transfers and corrupt archives — and asserts:
  *   P1  extract/extractLinks NEVER throw, for any host family;
  *   P2  a TRUNCATED article page never fabricates text: the result is
  *       either "" or the exact original body (every family's extraction
  *       needs an intact end-delimiter, so a cut page degrades to "");
  *   P3  byte-identity still holds on the untouched original (guards the
  *       generators themselves).
  */
class ParserRobustnessSpec extends AnyFunSuite {

  private val hostsByFamily: Map[Int, String] =
    FixtureConstants.hosts.groupBy(_.family).map { case (f, hs) => f -> hs.head.host }

  private val words = Vector("alpha", "beta", "gamma", "delta", "data", "spark",
    "crawl", "index", "feed", "quote", "press", "wire")

  // All 8 extractor families (6/7 have no fixture host — extraction goes
  // through the family-explicit kernel, which is what host dispatch calls).
  private val genArticle: Gen[(Int, String, Array[Byte])] = for {
    family <- Gen.choose(0, Parsers.NumFamilies - 1)
    nWords <- Gen.choose(1, 40)
    ws <- Gen.listOfN(nWords, Gen.oneOf(words))
    docId <- Gen.choose(0L, 5000L)
  } yield {
    val source = hostsByFamily.get(family).map(_.split('.')(0)).getOrElse("srcX")
    val body = ws.mkString(" ")
    val html = Parsers.renderArticle(family, s"Doc $docId", source, body,
      Constants.EPOCH.plusSeconds(docId * 60), Constants.tickersOf(docId))
    (family, body, html)
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }

  test("P3: untouched render still extracts byte-identically") {
    check(Prop.forAll(genArticle) { case (family, body, html) =>
      Parsers.extractFamily(family, html) == body
    })
  }

  test("P1+P2: truncation never throws and never fabricates text") {
    val gen = for {
      (family, body, html) <- genArticle
      cut <- Gen.choose(0, html.length)
    } yield (family, body, html.take(cut))
    check(Prop.forAll(gen) { case (family, body, cut) =>
      val got = Parsers.extractFamily(family, cut) // must not throw
      Parsers.extractLinks(cut)                    // must not throw
      got == "" || got == body
    })
  }

  test("P1: random byte corruption never throws (extract + links)") {
    val gen = for {
      (family, _, html) <- genArticle
      nFlips <- Gen.choose(1, 8)
      flips <- Gen.listOfN(nFlips, Gen.zip(Gen.choose(0, html.length - 1), Gen.choose(0, 255)))
    } yield {
      val mutated = html.clone()
      flips.foreach { case (i, b) => mutated(i) = b.toByte }
      (family, mutated)
    }
    check(Prop.forAll(gen) { case (family, mutated) =>
      val s = Parsers.extractFamily(family, mutated)
      Parsers.extractLinks(mutated)
      s != null
    })
  }

  test("P1: corrupted json-ld unicode escapes degrade without throwing") {
    // Directly target the \uXXXX path: corrupt the hex digits.
    val host = hostsByFamily(3)
    val body = "café résumé text"
    val html = new String(Parsers.renderArticle(3, "T", "src", body), StandardCharsets.UTF_8)
    val bad1 = html.replace("caf", "\\uZZ12 caf")   // non-hex escape
    val bad2 = {                                    // escape cut by page end
      val i = html.indexOf("articleBody")
      html.substring(0, i + 20) + "\\u1"
    }
    for (s <- Seq(bad1, bad2)) {
      val out = Parsers.extract(host, s.getBytes(StandardCharsets.UTF_8))
      assert(out != null) // no throw; content is garbage-in-garbage-out
    }
  }
}
