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
}
