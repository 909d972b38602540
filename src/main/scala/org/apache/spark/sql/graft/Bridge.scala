package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Thin bridge into `private[sql]` Spark surface, following the standard
  * extension-library pattern of hosting a small object under
  * org.apache.spark.sql.* (cf. public Spark extensions like Qbeast/Pathling —
  * see /root/repo/SNIPPETS.md). Everything else in this codebase lives in
  * the graft.* namespace and goes through these two entry points. */
object Bridge {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unwrap a user-facing Column to its Catalyst Expression. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Session-scoped registration of a native expression so it is also
    * callable via SQL / functions.call_function. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
