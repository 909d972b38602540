package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Frontier priority score — SURVEY.md §2 ops 24/38.
  *
  * priority = source_weight * exp(-λ * age_seconds(warc_ts)), with "now"
  * pinned to [[Constants.NOW]] so the score is a pure function of the row
  * (constant-folds into the scan-side projection; deterministic across runs
  * and parallelism levels).
  *
  * Ordering note (SURVEY.md §7 gotcha 3): priority alone is not a total
  * order; every consumer must order by (priority desc, warc_ts desc, url asc)
  * — the url tie-break makes crawl order deterministic.
  */
object Priority {

  /** Column flavor — pure builtins, codegen'd, DuckDB-expressible. */
  def score(weight: Column, warcTs: Column): Column =
    weight * exp(lit(-Constants.Lambda) * (lit(Constants.NowEpochSec) - unix_timestamp(warcTs)))

  /** Pure-Scala flavor for the sequential oracle; must match [[score]]
    * bit-for-bit (both are java.lang.Math.exp over the same doubles). */
  def scoreScala(weight: Double, warcTsEpochSec: Long): Double =
    weight * math.exp(-Constants.Lambda * (Constants.NowEpochSec - warcTsEpochSec).toDouble)
}
