package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions._
import graft.ml.{Dedup, Multimodal, Similarity}

/** Training-data pipeline operators: native expression correctness (incl.
  * the codegen path), MinHash recall vs brute force, SimHash banding
  * exactness, LSH-ANN recall vs the brute-force baseline, multimodal
  * plumbing shape. */
class MlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native cosine_sim matches a reference implementation (codegen path)") {
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(-1.0f, 0.5f, 2.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = vecs.as("a").join(vecs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        cosine_sim($"a.embedding", $"b.embedding").as("cos"))
      .as[(Long, Long, Double)].collect().map { case (a, b, c) => (a, b) -> c }.toMap
    def ref(x: Seq[Float], y: Seq[Float]): Double = {
      val dot = x.zip(y).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val nx = math.sqrt(x.map(a => a.toDouble * a.toDouble).sum)
      val ny = math.sqrt(y.map(a => a.toDouble * a.toDouble).sum)
      if (nx == 0 || ny == 0) 0.0 else dot / (nx * ny)
    }
    val v = Map(1L -> Seq(1.0f, 2.0f, 3.0f), 2L -> Seq(-1.0f, 0.5f, 2.0f), 3L -> Seq(0f, 0f, 0f))
    for (((a, b), c) <- got) assert(math.abs(c - ref(v(a), v(b))) < 1e-12)
    assert(got((1L, 3L)) === 0.0) // zero-norm guard
  }

  test("native hamming / rolling_hash / simhash agree between eval and codegen") {
    val df = Seq(("abc def", 5L, 9L), ("abc  def", 1L, 3L)).toDF("s", "x", "y")
    // codegen path (projection) vs interpreted eval (filter on literal fold)
    val rows = df.select(
      hamming($"x", $"y").as("h"),
      rolling_hash($"s").as("rh"),
      simhash($"s").as("sh")).collect()
    assert(rows(0).getInt(0) === java.lang.Long.bitCount(5L ^ 9L))
    // same kernels, driver-side:
    import org.apache.spark.unsafe.types.UTF8String
    assert(rows(0).getLong(1) === graft.functions.NativeOps.rollingHash(UTF8String.fromString("abc def")))
    assert(rows(0).getLong(2) === graft.functions.NativeOps.simHash(UTF8String.fromString("abc def")))
    // simhash is whitespace-robust (token multiset identical)
    assert(rows(0).getLong(2) === rows(1).getLong(2))
  }

  test("minhash+LSH pairs: perfect precision, high recall vs brute force (sf0.001)") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val got = Dedup.minhashPairs(docs, threshold = 0.95)
      .select("a", "b").as[(Long, Long)].collect().toSet

    // Brute-force truth over identical-token-set representatives.
    val reps = docs
      .select($"doc_id", array_distinct(split($"text", " ")).as("ts"))
      .withColumn("setkey", xxhash64(concat_ws(" ", array_sort($"ts"))))
      .groupBy("setkey").agg(min("doc_id").as("rep"), first("ts").as("ts"))
    val l = reps.select($"rep".as("a"), $"ts".as("ts_a"))
    val r = reps.select($"rep".as("b"), $"ts".as("ts_b"))
    val truth = l.join(r, $"a" < $"b")
      .withColumn("j", round(Dedup.jaccard($"ts_a", $"ts_b"), 4))
      .filter($"j" >= 0.95)
      .select("a", "b").as[(Long, Long)].collect().toSet

    assert(got.subsetOf(truth), "false positives survived exact verification")
    val recall = if (truth.isEmpty) 1.0 else got.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall too low (got ${got.size} of ${truth.size})")
  }

  test("simhash banding finds EXACTLY the hamming<=3 pairs (pigeonhole)") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet").limit(200)
    val got = Dedup.simhashPairs(docs, maxDist = 3)
      .select("a", "b", "hamming_dist").as[(Long, Long, Int)].collect().toSet
    val sigs = docs.select($"doc_id", simhash($"text").as("sig"))
      .as[(Long, Long)].collect()
    val truth = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === truth)
  }

  test("knn LSH: recall vs brute force is usable and pairs are a subset") {
    val e = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val q = e.filter($"vec_id" % 50 === 0)
    val brute = Similarity.knnBruteForce(q, e, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.knnLsh(spark, q, e, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.3, s"ANN recall $recall collapsed") // random fixture vectors: buckets are noisy
    // every ANN result must come from a real bucket collision (no dupes)
    val dupes = Similarity.knnLsh(spark, q, e, 5)
      .groupBy("query_id", "neighbor_id").count().filter($"count" > 1).count()
    assert(dupes === 0L)
  }

  test("multimodal decode plumbing: schema, determinism, per-kind behavior") {
    val media = graft.core.Fixtures.table(spark, TestSpark.Sf0001, "media")
    val feats = Multimodal.decodeFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(f => f.byte_len > 0 && f.thumb_w <= 32 && f.thumb_h <= 32))
    assert(rows.filter(_.kind == "video").forall(_.n_frames_sampled > 0))
    assert(rows.filter(_.kind != "video").forall(_.n_frames_sampled == 0))
    // determinism across runs
    val again = Multimodal.decodeFeatures(spark, media).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }
}
