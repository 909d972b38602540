package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — SURVEY.md §2 op 7/8/9.
  *
  * One canonical form shared by the distributed pipeline, the DuckDB oracle
  * SQL, the pure-Scala sequential oracle, and the fixture generator:
  *
  *   canonical(url) = "https://" + lower(host) + normalizePath(path)
  *
  * where normalizePath collapses duplicate slashes and strips trailing
  * slashes (so the site root canonicalizes to "https://host"). Query strings
  * (tracking params — the only query strings in the fixture universe,
  * FIXTURES.md B1) and fragments are dropped entirely.
  *
  * %-decoding is GUARDED (round 4): a %XX escape is decoded iff the decoded
  * octet is an RFC 3986 unreserved character (ALPHA/DIGIT/-._~), so
  * gratuitously-escaped urls (https://h/a%72ticles/1) dedup against their
  * plain spelling — what production canonicalizers do — while blanket
  * `url_decode` stays rejected: its '+'→' ' (URLDecoder semantics) breaks
  * idempotence (c(c(u)) == c(u), property P1, SURVEY.md §5). The guarded
  * decode preserves P1: decoded chars are never '%', and a surviving escape
  * decodes to a non-unreserved octet, so a second pass is the identity
  * (pinned by CoreSpec's P1 property sample).
  *
  * The Column flavor is Catalyst builtins + the native codegen'd
  * `pct_decode_unreserved` expression (oracle-expressible over the fixture
  * escape set via regexp_replace with a backreference); the Scala flavor
  * backs the sequential oracle. `CanonicalizeSpec` asserts they agree
  * byte-exactly on every fixture url.
  */
object Canonicalize {

  /** Lowercased host of a url (Column flavor). */
  def hostOf(url: Column): Column = lower(try_parse_url(url, lit("HOST")))

  /** Canonical url (Column flavor) — null if the url has no parseable host.
    * Decode before slash-normalization (decoded chars are never '/'; the
    * order is immaterial but must match the Scala flavor). */
  def canonicalUrl(url: Column): Column = {
    val rawPath = coalesce(try_parse_url(url, lit("PATH")), lit(""))
    val decoded = graft.functions.expressions.pct_decode_unreserved(rawPath)
    val path = regexp_replace(regexp_replace(decoded, "/{2,}", "/"), "/+$", "")
    when(try_parse_url(url, lit("HOST")).isNull, lit(null))
      .otherwise(concat(lit("https://"), hostOf(url), path))
  }

  /** Scheme filter predicate (op 10): keep only http/https urls. */
  def isHttpScheme(url: Column): Column =
    lower(try_parse_url(url, lit("PROTOCOL"))).isin("http", "https")

  /** 64-bit key of the canonical url (op 9) — Spark xxhash64, seed 42. */
  def urlHash(canonical: Column): Column = xxhash64(canonical)

  /** Bloom shard of a url hash (op 12/19). */
  def shardOf(urlHash: Column): Column = pmod(urlHash, lit(Constants.NumShards))

  // ------------------------------------------------------------------
  // Pure-Scala flavor (sequential oracle + fixture generator).
  // ------------------------------------------------------------------

  /** Pure-Scala canonicalization; None if no parseable http(s) host. */
  def canonicalScala(url: String): Option[String] = {
    val uri =
      try new java.net.URI(url)
      catch { case _: java.net.URISyntaxException => return None }
    val scheme = Option(uri.getScheme).map(_.toLowerCase).getOrElse("")
    if (scheme != "http" && scheme != "https") return None
    val host = Option(uri.getHost).map(_.toLowerCase).getOrElse(return None)
    val rawPath = graft.functions.NativeOps
      .pctDecodeUnreservedScala(Option(uri.getRawPath).getOrElse(""))
    val path = rawPath.replaceAll("/{2,}", "/").replaceAll("/+$", "")
    Some("https://" + host + path)
  }

  /** Pure-Scala host extraction (lowercased). */
  def hostScala(url: String): Option[String] =
    try Option(new java.net.URI(url).getHost).map(_.toLowerCase)
    catch { case _: java.net.URISyntaxException => None }
}
