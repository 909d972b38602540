package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Checkpoints

/** Backward compatibility of the checkpoint format (round-2 ADVICE): a
  * pre-upgrade state dir (manifests without the cumulative *_total fields;
  * fetch_log deltas without urls_article) must resume with CORRECT running
  * totals, not silent zeros, and batchCounts must not fail. */
class CheckpointCompatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readManifest recovers totals from old-format manifests by summing") {
    val dir = Files.createTempDirectory("graft-ckpt-compat").toString
    val cp = Paths.get(dir, "checkpoints")
    Files.createDirectories(cp)
    // Old format: per-batch fields only, no *_total keys.
    val batches = Seq((1L, 10L, 8L, 7L), (2L, 5L, 5L, 5L), (3L, 2L, 1L, 1L))
    for ((k, s, f, p) <- batches)
      Files.writeString(cp.resolve(s"$k.json"),
        s"""{"batch_id":$k,"article_count":${k * 3},"scheduled":$s,"fetched":$f,"parsed":$p}""")
    val m = Checkpoints.readManifest(dir, 3L)
    assert(m.batchId === 3L)
    assert(m.articleCount === 9L)
    assert(m.scheduledTotal === 17L, "scheduled total not recovered")
    assert(m.fetchedTotal === 14L)
    assert(m.parsedTotal === 13L)
    // New-format manifests are read as-is (no re-summing).
    Checkpoints.commitManifest(dir, Checkpoints.Manifest(4L, 12L, 1L, 1L, 1L, 18L, 15L, 14L))
    val m4 = Checkpoints.readManifest(dir, 4L)
    assert(m4.scheduledTotal === 18L && m4.fetchedTotal === 15L && m4.parsedTotal === 14L)
  }

  test("batchCounts derives article counts when fetch_log lacks urls_article") {
    val dir = Files.createTempDirectory("graft-ckpt-compat2").toString
    // Old-format fetch_log delta: no urls_article column.
    Seq((0, 1L, 6L, 5L, 100L))
      .toDF("partition_id", "host_bucket", "urls_fetched", "urls_parsed", "bytes")
      .write.parquet(s"$dir/fetch_log/b1")
    Seq(("h0.example.com", 7L)).toDF("host", "urls_scheduled")
      .write.parquet(s"$dir/host_log/b1")
    // Articles delta carries the ground truth row count.
    Seq(("https://h0.example.com/articles/1", 1L), ("https://h0.example.com/articles/2", 2L))
      .toDF("url", "fetch_order")
      .write.parquet(s"$dir/articles/b1")
    val (sched, fetched, parsed, arts) = Checkpoints.batchCounts(spark, dir, 1L)
    assert(sched === 7L)
    assert(fetched === 6L)
    assert(parsed === 5L)
    assert(arts === 2L, "article count not derived from articles delta")

    // A zero-article pre-upgrade batch may have NO articles delta dir at
    // all — the fallback must report 0, not throw AnalysisException.
    Seq((0, 1L, 3L, 0L, 50L))
      .toDF("partition_id", "host_bucket", "urls_fetched", "urls_parsed", "bytes")
      .write.parquet(s"$dir/fetch_log/b2")
    Seq(("h0.example.com", 3L)).toDF("host", "urls_scheduled")
      .write.parquet(s"$dir/host_log/b2")
    val (s2, f2, p2, a2) = Checkpoints.batchCounts(spark, dir, 2L)
    assert((s2, f2, p2, a2) === ((3L, 3L, 0L, 0L)))
  }
}
