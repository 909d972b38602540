package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.{cosine_sim, dot_product}

/** Similarity search over an embedding column (task brief):
  * brute-force cosine top-k baseline + LSH-bucketed ANN scale path.
  *
  * The pairwise kernel is the native codegen'd [[graft.functions.expressions
  * .CosineSimilarity]] — inside the O(|Q|·|N|) join a Scala UDF would pay
  * boxing per pair.
  *
  * Scale notes: brute force is the correctness baseline (and is exactly what
  * a 1000-executor cluster does for moderate |Q|: broadcast Q, one pass over
  * N, per-partition top-k then global top-k). The ANN path buckets by L
  * random-hyperplane sign keys (deterministic, seed-derived hyperplanes) so
  * candidate generation is an equi-join, no all-pairs pass; recall is
  * measured against the baseline in SimilaritySpec.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    * queries/candidates: (vec_id, embedding). Output (query_id, neighbor_id,
    * rank, cos). */
  def knnBruteForce(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = candidates.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic ±1 hyperplanes: `tables` tables × `planesPerTable` planes
    * × dim components, from a fixed LCG. */
  def hyperplanes(tables: Int, planesPerTable: Int, dim: Int): Seq[Seq[Seq[Float]]] = {
    var state = 0x9e3779b97f4a7c15L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    Seq.tabulate(tables, planesPerTable, dim) { (_, _, _) =>
      if ((next() >>> 63) == 1L) 1.0f else -1.0f
    }
  }

  /** LSH sign-bucket keys per vector: one (table, key) row per table. */
  def lshKeys(vecs: DataFrame, tables: Int = 8, planesPerTable: Int = 4,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(tables, planesPerTable, dim)
    val tableKeys = (0 until tables).map { t =>
      val bits = (0 until planesPerTable).map { p =>
        (dot_product(col("embedding"), typedlit(planes(t)(p))) > 0).cast("long")
      }
      val key = bits.zipWithIndex
        .map { case (b, i) => b * lit(1L << i) }
        .reduce(_ + _)
      struct(lit(t).as("tbl"), key.as("key"))
    }
    vecs.select(col("vec_id"), col("embedding"),
      explode(array(tableKeys: _*)).as("tk"))
      .select(col("vec_id"), col("embedding"),
        col("tk.tbl").as("tbl"), col("tk.key").as("key"))
  }

  /** Approximate top-k: candidates = vectors sharing any LSH bucket with the
    * query; then exact cosine rank within candidates. */
  def knnLsh(spark: SparkSession, queries: DataFrame, candidates: DataFrame,
      k: Int, tables: Int = 8, planesPerTable: Int = 4): DataFrame = {
    val qk = lshKeys(queries, tables, planesPerTable)
      .select(col("tbl"), col("key"), col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val ck = lshKeys(candidates, tables, planesPerTable)
      .select(col("tbl"), col("key"), col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val cands = ck.join(broadcast(qk), Seq("tbl", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "q_emb", "c_emb")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine_sim(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("neighbor_id"))
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup dedup). */
  def cosineNearDupPairs(vecs: DataFrame, threshold: Double): DataFrame = {
    val a = vecs.select(col("vec_id").as("a"), col("embedding").as("e_a"))
    val b = vecs.select(col("vec_id").as("b"), col("embedding").as("e_b"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", cosine_sim(col("e_a"), col("e_b")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 4).as("cos"))
  }
}
