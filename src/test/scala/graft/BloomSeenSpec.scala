package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Constants
import graft.operators.BloomSeen

/** M2: partitioned Bloom seen-set — property P2 (no false negatives, merge
  * commutativity) and two-tier-vs-exact parity (SURVEY.md §5). */
class BloomSeenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom aggregator: no false negatives across shards, blob roundtrip") {
    val hashes = (1L to 10000L).map(i => i * 2654435761L + 17L)
    val shards = BloomSeen.buildShards(hashes.toDF("url_hash"))
    val blobs = shards.select($"shard".cast("int"), $"filter")
      .as[(Int, Array[Byte])].collect().toMap
    assert(blobs.size > 1 && blobs.size <= Constants.NumShards)
    val filters = blobs.map { case (s, b) => s -> BloomSeen.deserialize(b) }
    for (h <- hashes) {
      val s = java.lang.Math.floorMod(h, Constants.NumShards.toLong).toInt
      assert(filters(s).mightContainLong(h), s"false negative for $h")
    }
    // n_items bookkeeping
    val total = shards.agg(sum("n_items")).head().getLong(0)
    assert(total === hashes.size.toLong)
  }

  test("mergeShards ORs filters: merged contains both sides' keys") {
    val a = BloomSeen.buildShards((1L to 500L).toDF("url_hash"))
    val b = BloomSeen.buildShards((10001L to 10500L).toDF("url_hash"))
    val merged = BloomSeen.mergeShards(a, b)
      .select($"shard".cast("int"), $"filter").as[(Int, Array[Byte])].collect().toMap
    val filters = merged.map { case (s, blob) => s -> BloomSeen.deserialize(blob) }
    for (h <- (1L to 500L) ++ (10001L to 10500L)) {
      val s = java.lang.Math.floorMod(h, Constants.NumShards.toLong).toInt
      assert(filters(s).mightContainLong(h))
    }
    // merge is symmetric in membership
    val merged2 = BloomSeen.mergeShards(b, a)
      .select($"shard".cast("int"), $"filter").as[(Int, Array[Byte])].collect().toMap
    val filters2 = merged2.map { case (s, blob) => s -> BloomSeen.deserialize(blob) }
    for (h <- (1L to 500L) ++ (10001L to 10500L)) {
      val s = java.lang.Math.floorMod(h, Constants.NumShards.toLong).toInt
      assert(filters2(s).mightContainLong(h))
    }
  }

  test("two-tier anti-join == exact-only anti-join (both probe shapes)") {
    val seen = (1L to 3000L).map(i => (i * 31L, s"u$i")).toDF("url_hash", "url")
      .withColumn("status", lit("fetched"))
    val shards = BloomSeen.buildShards(seen.select("url_hash"))
    // candidates: half seen, half new
    val cands = ((1L to 1500L).map(i => i * 31L) ++ (1L to 1500L).map(i => i * 31L + 7L))
      .toDF("url_hash")
      .withColumn("url", concat(lit("c"), col("url_hash")))
    val (bucketedDf, cached) = BloomSeen.antiJoinSeen(spark, cands, seen, Some(shards))
    val bucketed = bucketedDf.select("url_hash").as[Long].collect().sorted
    cached.foreach(_.unpersist())
    val broadcasted = BloomSeen.antiJoinSeen(spark, cands, seen, Some(shards),
      broadcastProbe = true)._1
      .select("url_hash").as[Long].collect().sorted
    val exact = BloomSeen.antiJoinSeen(spark, cands, seen, None)._1
      .select("url_hash").as[Long].collect().sorted
    assert(bucketed.toSeq === exact.toSeq)
    assert(broadcasted.toSeq === exact.toSeq)
    assert(bucketed.length === 1500)
  }

  test("bucketed probe keeps every candidate column and flags correctly") {
    val seen = (1L to 200L).map(i => (i * 13L, s"u$i")).toDF("url_hash", "url")
    val shards = BloomSeen.buildShards(seen.select("url_hash"))
    val cands = ((1L to 100L).map(i => i * 13L) ++ (1L to 100L).map(i => i * 13L + 5L))
      .toDF("url_hash")
      .withColumn("url", concat(lit("c"), col("url_hash")))
      .withColumn("extra", col("url_hash") * 2)
    val flagged = BloomSeen.tagMaybeSeenBucketed(cands, shards)
    assert(flagged.columns.toSeq === Seq("url_hash", "url", "extra", "__maybe_seen"))
    val rows = flagged.select("url_hash", "__maybe_seen").as[(Long, Boolean)].collect().toMap
    assert(rows.size === 200)
    // no false negatives: every truly-seen hash must be flagged
    for (i <- 1L to 100L) assert(rows(i * 13L), s"false negative for ${i * 13L}")
  }
}
