package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over the document corpus — the "indexing"
  * half of a news-indexing engine: BM25 (Robertson/Spärck Jones; the
  * Okapi formula with the Lucene +1 idf floor so idf stays positive for
  * terms in more than half the corpus).
  *
  * Plan shape at 100 TB:
  *   - the postings build explodes tokens and FILTERS TO THE QUERY TERMS
  *     before any aggregation, so every shuffle downstream carries the
  *     query-relevant slice only (|q| terms × matching docs), never the
  *     corpus token stream;
  *   - tf is a two-level hash agg (map-side combine collapses each doc's
  *     repeated terms pre-shuffle);
  *   - df re-aggregates the tf frame (one row per doc×term, so
  *     count == document frequency) — key space = |q| terms;
  *   - corpus-level N/avgdl is a 1-row aggregate attached with a
  *     broadcast cross join (a 1-row BNLJ is a per-row constant, not a
  *     quadratic join);
  *   - top-k goes through orderBy+limit = TakeOrderedAndProject
  *     (partial per-partition top-k, no global sort, no window).
  *
  * Scores are summed raw and rounded to 4 dp only in the output (the
  * oracle mirrors the formula token-for-token; constants are
  * interpolated from [[K1]]/[[B]] so engine and oracle cannot drift).
  */
object Search {

  /** Okapi BM25 defaults (Robertson et al., TREC-3). */
  val K1: Double = 1.2
  val B: Double = 0.75

  /** The BM25 sum over prepared frames — tf (doc_id, term, tf), df
    * (term, df), lens (doc_id, dl), stats (1 row: n_docs, avgdl). Shared
    * by the inline path and the persisted-index path so the formula
    * exists exactly once. */
  private def scoreFrames(tf: DataFrame, df: DataFrame, lens: DataFrame,
      stats: DataFrame): DataFrame = {
    // Parenthesization mirrors the oracle SQL exactly (left-assoc chains)
    // so the double arithmetic is bit-identical per term; only the final
    // sum's addition order differs, absorbed by the 4-dp output rounding.
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val s = idf * col("tf") * lit(K1 + 1) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl")))
    tf.join(df, Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), s.as("s"))
      .groupBy("doc_id")
      .agg(sum("s").as("bm25_raw"))
  }

  /** (doc_id, bm25_raw) for every document sharing >= 1 term with the
    * query — raw double scores, for callers that sort or threshold. */
  private def scoresRaw(docs: DataFrame, queryTerms: Seq[String]): DataFrame = {
    val lens = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(queryTerms.map(t => t: Any): _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    scoreFrames(tf, df, lens, stats)
  }

  /** BM25 scores for ALL matching documents, rounded to 4 dp — the
    * oracle-checked full relation (no top-k cutoff, so float-noise at a
    * rank boundary cannot flip membership). */
  def bm25Scores(docs: DataFrame, queryTerms: Seq[String]): DataFrame =
    scoresRaw(docs, queryTerms)
      .select(col("doc_id"), round(col("bm25_raw"), 4).as("bm25"))

  /** Top-k BM25 retrieval — sorts on the RAW score (ties broken by
    * doc_id for determinism), rounds only the output. orderBy+limit
    * plans as TakeOrderedAndProject: per-partition partial top-k, no
    * global sort (pinned in SearchSpec). */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int): DataFrame =
    scoresRaw(docs, queryTerms)
      .orderBy(col("bm25_raw").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("bm25_raw"), 4).as("bm25"))

  /** Builds and persists the inverted index — the index-once/query-many
    * deployment split a news-indexing engine actually runs (same shape as
    * the IVF model in [[Similarity.saveIvfModel]]). Four parquet tables
    * under `path`:
    *   postings/ (term, doc_id, tf)  — repartitioned + sorted by term, so
    *     parquet row-group min/max stats prune a query-term read down to
    *     a handful of row groups (the `term IN (...)` predicate pushes to
    *     the scan; at 100 TB this is the difference between reading the
    *     index and reading a vocabulary-sized slice of it). NOT
    *     `partitionBy("term")`: a web-scale vocabulary would mean
    *     millions of directories.
    *   dfreq/ (term, df)             — document frequencies, precomputed
    *     once at build time instead of per query.
    *   lens/ (doc_id, dl), stats/ (1 row) — the normalization inputs.
    * A `_INDEX_COMMITTED` marker is written LAST — readers treat its
    * absence as "no index" (the per-table _SUCCESS files only cover one
    * table each). */
  def saveIndex(docs: DataFrame, path: String): Unit = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    tf.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings")
    tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .write.mode("overwrite").parquet(s"$path/dfreq")
    val lens = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("double").as("dl"))
    lens.write.mode("overwrite").parquet(s"$path/lens")
    lens.agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
      .write.mode("overwrite").parquet(s"$path/stats")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(path, "_INDEX_COMMITTED"))
  }

  /** True iff `path` holds a fully committed index. */
  def indexCommitted(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_INDEX_COMMITTED"))

  /** BM25 over a persisted index — no corpus scan: the query-term filter
    * pushes into the postings/dfreq parquet scans (row-group pruning via
    * the build-time sort), lens joins on doc_id for the matched docs
    * only, stats is one row. Result == [[bm25Scores]] over the indexed
    * corpus (pinned in SearchSpec). */
  def bm25ScoresFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String]): DataFrame = {
    val inQuery = col("term").isin(queryTerms.map(t => t: Any): _*)
    val tf = spark.read.parquet(s"$path/postings").filter(inQuery)
    val df = spark.read.parquet(s"$path/dfreq").filter(inQuery)
    val lens = spark.read.parquet(s"$path/lens")
    val stats = spark.read.parquet(s"$path/stats")
    scoreFrames(tf, df, lens, stats)
      .select(col("doc_id"), round(col("bm25_raw"), 4).as("bm25"))
  }

  /** Exact phrase search: documents containing `phrase` as consecutive
    * whitespace tokens. A phrase of n words IS a word n-gram, so this
    * reuses the native `shingles_n` kernel at width n(phrase):
    * scan → codegen'd array_contains filter — a pure map stage, no
    * shuffle, no UDF; column pruning keeps the scan at (doc_id, text).
    * (Multi-space runs in the phrase would never match the kernel's
    * split(' ') token grain — normalize the needle, not the corpus.) */
  def phraseDocs(docs: DataFrame, phrase: String): DataFrame = {
    val n = phrase.split(' ').count(_.nonEmpty)
    require(n >= 1, "phrase must contain at least one token")
    docs
      .filter(array_contains(
        graft.functions.expressions.shingles_n(col("text"), n), phrase))
      .select(col("doc_id"))
  }
}
