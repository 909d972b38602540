package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's smoke check: SparkEntry.entry rows > 0 on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n schema=${df.schema.simpleString}")
    df.show(5, truncate = false)
    spark.stop()
    assert(n > 0, "entry returned no rows")
  }
}
