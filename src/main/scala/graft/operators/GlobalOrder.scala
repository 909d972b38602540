package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global row-numbering — the scalable replacement for a
  * partition-less `row_number()` window (which moves ALL rows into one task).
  *
  * Range-partition by the sort key, sort within partitions, then
  * `zipWithIndex` assigns the global rank: index = (rows in earlier range
  * partitions) + (position within partition), which equals the global sort
  * rank REGARDLESS of where the sampled range bounds fell — so the result is
  * deterministic whenever the sort order is total (callers must include a
  * unique tie-break column). This is the one place the engine drops to the
  * RDD layer: per-partition index assignment is genuinely imperative
  * (task-brief preference order, last resort).
  */
object GlobalOrder {

  /** Append a 1-based dense global rank column by `order`. */
  def withRank(df: DataFrame, order: Seq[Column], parts: Int, rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(parts, order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
