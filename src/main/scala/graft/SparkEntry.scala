package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-operator entries from the query modules:
  *  - [[graft.queries.CrawlQueries]] — the URL-frontier/fetch-scheduler engine
  *    (SURVEY.md §2 crawl operators),
  *  - [[graft.queries.RelationalQueries]] — generic joins/aggs/windows/set-ops
  *    over the TPC-H-ish testdata (SURVEY.md §5.7),
  *  - [[graft.queries.PipelineQueries]] — training-data pipeline operators
  *    (dedup family, similarity search, text analysis, multimodal plumbing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * one politeness-budgeted, robots-filtered, priority-ranked micro-batch
    * schedule joined to its fetched+parsed pages. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_fetch_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CrawlQueries.entries ++
      graft.queries.RelationalQueries.entries ++
      graft.queries.PipelineQueries.entries ++
      graft.queries.StreamingQueries.entries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CrawlQueries.oracles ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.StreamingQueries.oracles
}
