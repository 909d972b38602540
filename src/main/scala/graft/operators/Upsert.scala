package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed latest-wins compaction — the READ side of an ES-style upsert sink
  * (SURVEY.md §1.1: the reference bulk-upserts articles keyed by url hash;
  * our sink is append-only per batch, so upsert semantics are realized at
  * read time: one surviving row per key, newest version wins).
  *
  * Scale notes: one shuffle on the key, rank + count computed in the same
  * window pass (no second aggregation), no driver involvement. At 10^10
  * keys this is the standard compaction job shape; a real deployment would
  * additionally fold compacted snapshots forward so each run only reads
  * deltas since the last compaction (exactly the crawl loop's append+
  * snapshot layout, CrawlLoop scale notes).
  */
object Upsert {

  /** One row per `keyCols` group: the first row under `ordering` (newest
    * first by convention), with an added `n_versions` count of the versions
    * compacted away. Ordering must be total within a key group for
    * deterministic output (tie-break on a unique column). */
  def latestWins(df: DataFrame, keyCols: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_versions",
        count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
