package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Constants, Fixtures}
import graft.operators.{Checkpoints, CrawlConfig, CrawlLoop, Scheduler}

/** FIXTURES.md B6/B7: at sf0.1 ~40% of pages sit on one mega-publisher
  * (src0.example.com). The fetch/parse stage must stay skew-balanced under
  * the salted repartition: per-partition fetched counts within 2x of the
  * mean. Also pins that the skew fixture actually exists. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sf0.1 skew fixture: ~40% of pages on the mega-host") {
    val pages = Fixtures.pages(spark, TestSpark.Sf01)
    val total = pages.count()
    val onSkew = pages.filter($"url".contains(Constants.SkewHost)).count()
    val frac = onSkew.toDouble / total
    assert(frac > 0.3 && frac < 0.5, s"skew fraction $frac")
  }

  test("salted parse stage keeps partitions within 2x of the mean (B7)") {
    val fixDir = Fixtures.ensure(spark, TestSpark.Sf01)
    val pages = spark.read.parquet(s"$fixDir/pages.parquet")
    val robots = spark.read.parquet(s"$fixDir/robots.parquet")
    val weights = spark.read.parquet(s"$fixDir/source_weights.parquet")
    val budgets = spark.read.parquet(s"$fixDir/budgets.parquet")
    val cfg = CrawlConfig(
      deltaPerBatchSec = 365L * 24 * 3600, budgetScale = 10000,
      saltParse = true, localTopKSalt = 8, useBloom = false,
      runTag = "skewspec")
    val frontier = CrawlLoop.seedFrontier(spark, fixDir)
    val emptySeen = Checkpoints.emptyFrame(spark, CrawlLoop.SeenSchema)
    val emptyShards = Checkpoints.emptyFrame(spark, CrawlLoop.ShardSchema)
    val r = Scheduler.runBatch(spark, pages, frontier, emptySeen, emptyShards,
      robots, weights, budgets, 1L, 0L, cfg)
    // fetch_log is the per-partition lineage of the salted parse stage.
    val counts = r.fetchLog
      .groupBy("partition_id").agg(sum("urls_fetched").as("n"))
      .select($"n").as[Long].collect()
    r.cached.foreach(_.unpersist())
    assert(counts.length > 1)
    val mean = counts.sum.toDouble / counts.length
    val worst = counts.max / mean
    assert(worst <= 2.0, s"partition skew ${worst}x (counts: ${counts.sorted.reverse.take(5).mkString(",")} / mean $mean)")
    // sanity: the batch actually fetched the mega-host's pages
    assert(counts.sum > 4000)
  }
}
