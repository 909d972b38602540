package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) — populated milestone by milestone. */
object PipelineQueries {
  val entries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
