package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.{hamming, simhash}

/** Training-data deduplication family (task brief):
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design notes (the 100 TB story):
  *  - Exact dedup groups by the full text key here (oracle parity); at scale
  *    the standard two-phase variant groups by xxhash64(text) first and
  *    verifies within groups, shuffling 8-byte keys instead of documents.
  *  - MinHash collapses IDENTICAL token-sets to one representative BEFORE
  *    LSH banding — without this, a low-entropy corpus (like this fixture's
  *    31-word vocabulary) floods every band bucket and the candidate join
  *    explodes quadratically.
  *  - SimHash banding (4×16 bits) is exact for hamming ≤ 3 by pigeonhole:
  *    every qualifying pair shares at least one full band, so the band
  *    equi-join has perfect recall — no nested-loop pass over all pairs.
  *  - n-gram Jaccard is the only genuinely pairwise op; it is blocked by
  *    `lang` (mirrored in the oracle) — a real pipeline would block by an
  *    LSH prefilter instead (that is what q31 is).
  */
object Dedup {

  /** Exact duplicate groups by full text: (keeper_url, n_copies). */
  def exactByText(pages: DataFrame): DataFrame =
    pages
      .groupBy(col("text"))
      .agg(min(col("url")).as("keeper_url"), count(lit(1)).as("n_copies"))
      .drop("text")

  private def tokens(c: Column): Column = split(c, " ")

  /** Distinct word 3-gram shingles of a text column. */
  def shingles3(text: Column): Column = {
    val t = tokens(text)
    val n = size(t)
    when(n >= 3,
      array_distinct(transform(sequence(lit(0), n - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact token-set Jaccard similarity of two distinct-token arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash+LSH near-duplicate pairs over token SETS.
    *
    * docs(doc_id, text) → (a, b, jaccard) for verified pairs with
    * token-set Jaccard ≥ `threshold`, where a/b are the min doc_ids of their
    * identical-token-set groups. 32 minhashes = 8 bands × 4 rows; candidates
    * are verified with the exact Jaccard, so precision is 1.0 and only
    * recall depends on the banding (P(candidate | j=0.9) ≈ 0.9998).
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.95,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val tokset = array_distinct(tokens(col("text")))
    // Collapse identical token-sets to one representative (see scale notes).
    val reps = docs
      .select(col("doc_id"), tokset.as("ts"))
      .withColumn("setkey", xxhash64(concat_ws(" ", array_sort(col("ts")))))
      .groupBy("setkey")
      .agg(min("doc_id").as("rep"), first("ts").as("ts"))

    // 32 minhashes: h_i = min over tokens of xxhash64(token, i).
    val sigs = (0 until numHashes).map(i =>
      array_min(transform(col("ts"), t => xxhash64(t, lit(i)))).as(s"h$i"))
    val withSig = reps.select(col("rep") +: col("ts") +: sigs: _*)

    // Band keys: hash of each band's signature slice. The banding join
    // carries ONLY (rep, band, key) — the token arrays stay out of the
    // shuffle and are attached after pair-dedup via broadcast joins against
    // the (small) representative table.
    val bandCols = (0 until bands).map { bnd =>
      val slice = (0 until rows).map(r => col(s"h${bnd * rows + r}"))
      struct(lit(bnd).as("band"), xxhash64(slice :+ lit(bnd): _*).as("key"))
    }
    val exploded = withSig
      .select(col("rep"), explode(array(bandCols: _*)).as("bk"))
      .select(col("rep"), col("bk.band").as("band"), col("bk.key").as("key"))

    val pairs = exploded.select(col("band"), col("key"), col("rep").as("a"))
      .join(exploded.select(col("band"), col("key"), col("rep").as("b")),
        Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()

    val toksOf = reps.select(col("rep"), col("ts"))
    pairs
      .join(broadcast(toksOf.select(col("rep").as("a"), col("ts").as("ts_a"))), Seq("a"))
      .join(broadcast(toksOf.select(col("rep").as("b"), col("ts").as("ts_b"))), Seq("b"))
      .withColumn("jaccard", round(jaccard(col("ts_a"), col("ts_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** SimHash near-duplicate pairs: (a, b, hamming_dist ≤ maxDist).
    * Exact for maxDist ≤ 3 via 4×16-bit band join (pigeonhole). */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4x16 banding is exact only for hamming <= 3")
    val sigs = docs.select(col("doc_id"), simhash(col("text")).as("sig"))
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band"),
          shiftrightunsigned(col("sig"), k * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.select(col("band"), col("key"), col("doc_id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("key"), col("doc_id").as("b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming(col("sig_a"), col("sig_b")).as("hamming_dist"))
      .distinct()
      .filter(col("hamming_dist") <= maxDist)
  }

  /** Exact word-3-gram Jaccard near-dup pairs, blocked by lang:
    * (a, b, jaccard ≥ threshold).
    *
    * Set-similarity join via an INVERTED INDEX on shingles (the LCJoin /
    * PPJoin family of plans — cf. PAPERS.md "Set Containment Join via List
    * Crosscutting"): explode (shingle → doc) postings, self-join within
    * (lang, shingle), count co-occurrences per pair = |A∩B|, then
    * |A∪B| = |A|+|B|−|A∩B|. Identical result to the naive all-pairs array
    * join, but the shuffle carries 8-byte ids instead of whole shingle
    * arrays, pairs with zero overlap never materialize, and the heavy
    * aggregation is a plain partial/final hash count. (Bench: 98 s → see
    * BENCH.md after rewrite.)
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = docs
      .select(col("doc_id"), col("lang"), shingles3(col("text")).as("sh"))
      .withColumn("sz", size(col("sh")))
    val postings = sh
      .select(col("doc_id"), col("lang"), col("sz"),
        explode(col("sh")).as("shingle"))
      // hash the shingle: equi-join on a long key, not a string
      .select(col("doc_id"), col("lang"), col("sz"), xxhash64(col("shingle")).as("sk"))
    val l = postings.select(col("lang"), col("sk"), col("doc_id").as("a"), col("sz").as("sz_a"))
    val r = postings.select(col("lang"), col("sk"), col("doc_id").as("b"), col("sz").as("sz_b"))
    l.join(r, Seq("lang", "sk"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }
}
