package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.{hamming, minhash_sig, simhash}

/** Training-data deduplication family (task brief):
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design notes (the 100 TB story):
  *  - Exact dedup is two-phase hash-first: the corpus-wide shuffle carries
  *    xxhash64(text) keys; document text only shuffles for hash groups with
  *    multiplicity > 1 (exact under collisions, see exactByText).
  *  - MinHash collapses IDENTICAL token-sets to one representative BEFORE
  *    LSH banding — without this, a low-entropy corpus (like this fixture's
  *    31-word vocabulary) floods every band bucket and the candidate join
  *    explodes quadratically.
  *  - SimHash banding (4×16 bits) is exact for hamming ≤ 3 by pigeonhole:
  *    every qualifying pair shares at least one full band, so the band
  *    equi-join has perfect recall — no nested-loop pass over all pairs.
  *  - n-gram Jaccard prunes its inverted-index join with the lossless
  *    PPJoin-family prefix + length filters (see ngramJaccardPairs) and is
  *    blocked by `lang` (mirrored in the oracle).
  */
object Dedup {

  /** Exact duplicate groups by full text: (keeper_url, n_copies).
    *
    * Two-phase hash-first plan: phase 1 groups by xxhash64(text), so the
    * big shuffle carries 8-byte keys + urls, never document bodies. Phase 2
    * re-groups by the text itself ONLY for rows whose hash has multiplicity
    * > 1 — exact under hash collisions, and the text-bearing shuffle is
    * bounded by the duplicate volume, not the corpus. (A single
    * groupBy(text) would shuffle the whole corpus as its group key — the
    * 100 TB killer this replaces.)
    */
  def exactByText(pages: DataFrame): DataFrame = {
    // Sentinel keeps NULL texts in one hash group (xxhash64(NULL) is NULL and
    // null keys don't match in the phase-2 semi-join); phase 2's groupBy
    // still separates a real NUL-prefixed "<null>" text from NULL.
    val th = xxhash64(coalesce(col("text"), lit("\u0000<null>")))
    val hashed = pages.select(col("url"), col("text"), th.as("th"))
    val groups = hashed
      .groupBy("th")
      .agg(min(col("url")).as("u1"), count(lit(1)).as("n"))
    val singles = groups
      .filter(col("n") === 1)
      .select(col("u1").as("keeper_url"), col("n").as("n_copies"))
    val multi = hashed
      .join(groups.filter(col("n") > 1).select("th"), Seq("th"), "left_semi")
      .groupBy("th", "text")
      .agg(min(col("url")).as("keeper_url"), count(lit(1)).as("n_copies"))
      .select("keeper_url", "n_copies")
    singles.unionByName(multi)
  }

  private def tokens(c: Column): Column = split(c, " ")

  /** Distinct word 3-gram shingles of a text column (first-occurrence
    * order — only ever consumed as a set).
    *
    * Kernel history (task-brief preference order): the Column/HOF chain
    * (transform/sequence/element_at) is CodegenFallback — interpreted,
    * measured ~16× slower (12.2 s vs 0.77 s for the sf0.1 postings build)
    * and re-evaluated at several points of the self-join DAG; a one-pass
    * Scala UDF replaced it (round 1), and round 4 replaced the UDF with
    * the native codegen'd `shingles3` expression (zero-copy byte-slice
    * shingles, no String decode, stays in whole-stage codegen — same
    * upgrade minhash_sig got in round 3; parity pinned in MlSpec). NULL
    * text yields NULL (standard unary-expression semantics; every consumer
    * explodes or sizes the array, where NULL and empty behave alike). */
  def shingles3(text: Column): Column = graft.functions.expressions.shingles3(text)

  /** Exact token-set Jaccard similarity of two distinct-token arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact Jaccard of two SORTED distinct arrays via a single merge pass —
    * the verification kernel for candidate pairs (array_intersect +
    * array_union build two hash sets per pair; the merge is allocation-free
    * and ~10× cheaper across millions of candidates). Same value as
    * [[jaccard]] by set semantics. */
  private val jaccardSortedUdf = udf { (a0: Seq[String], b0: Seq[String]) =>
    // Null-safe (a NULL text upstream yields a null token array): an absent
    // side has an empty set — same convention as shinglesUdf.
    val a = if (a0 == null) Seq.empty[String] else a0
    val b = if (b0 == null) Seq.empty[String] else b0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  // Signature kernel history: a Column formulation
  // (`array_min(transform(ts, t => xxhash64(t, i)))` × numHashes) is
  // interpreted (CodegenFallback) and walks the array once per hash —
  // measured ~16× slower (round 2); a one-pass Scala UDF replaced it, and
  // round 3 replaced the UDF with the native codegen'd `minhash_sig`
  // expression (graft.functions.expressions.MinHashSig): no Seq[String]
  // boxing, no UTF-8→String decode, stays inside whole-stage codegen.

  /** MinHash+LSH near-duplicate pairs over token SETS.
    *
    * docs(doc_id, text) → (a, b, jaccard) for verified pairs with
    * token-set Jaccard ≥ `threshold`, where a/b are the min doc_ids of their
    * identical-token-set groups. Candidates are verified with the exact
    * Jaccard, so precision is 1.0 and only recall depends on the banding.
    *
    * Banding 8 bands × 16 rows puts the s-curve midpoint (1/b)^(1/r) at
    * ≈ 0.88 — just under the 0.95 threshold, the textbook placement:
    * P(candidate | j=0.95) = 1−(1−0.95^16)^8 ≈ 0.99 (recall), while a
    * j=0.8 pair collides with probability ≈ 0.20 and j=0.7 ≈ 0.03. The
    * round-1 setting (8×4, midpoint 0.59) made HALF of all pairs of this
    * low-entropy corpus candidates (4.0 M from 3.9 k reps at sf0.1) — the
    * candidate count, not the signature cost, is what banding must control.
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.95,
      numHashes: Int = 128, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val tokset = array_sort(array_distinct(tokens(col("text"))))
    // Collapse identical token-sets to one representative (see scale notes).
    // The repartition decouples the CPU-bound tokenize/hash kernels from the
    // input file-block layout (a small parquet plans 1 split → serial
    // signatures); one narrow shuffle of (doc_id, text), negligible next to
    // the signature work it parallelizes.
    val reps = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokset.as("ts"))
      .withColumn("setkey", xxhash64(concat_ws(" ", col("ts"))))
      .groupBy("setkey")
      .agg(min("doc_id").as("rep"), first("ts").as("ts"))
    val withSig = reps.select(col("rep"), col("ts"),
      minhash_sig(col("ts"), numHashes).as("sig"))

    // Band keys: hash of each band's signature slice. The banding join
    // carries ONLY (rep, band, key) — the token arrays stay out of the
    // shuffle and are attached after pair-dedup via broadcast joins against
    // the (small) representative table.
    val bandCols = (0 until bands).map { bnd =>
      val slice = (0 until rows).map(r => col("sig").getItem(bnd * rows + r))
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

    // Attach token arrays to candidate pairs with plain SHUFFLED equi-joins
    // on the representative id — deliberately NOT broadcast(toksOf): the
    // representative table is corpus-sized (every distinct token-set), so a
    // broadcast of it dies at 10^10 docs even though it is tiny at sandbox
    // scale. AQE may still pick a broadcast at runtime when the MEASURED
    // size is small — that is the right call per scale, and the absence of
    // a forced broadcast is pinned by MlSpec ("minhash attach joins carry no
    // broadcast hint").
    val toksOf = reps.select(col("rep"), col("ts"))
    pairs
      .join(toksOf.select(col("rep").as("a"), col("ts").as("ts_a")), Seq("a"))
      .join(toksOf.select(col("rep").as("b"), col("ts").as("ts_b")), Seq("b"))
      // ts is array_sort'ed above — the merge-pass kernel applies.
      .withColumn("jaccard", round(jaccardSortedUdf(col("ts_a"), col("ts_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Fuzzy decontamination: which corpus documents are NEAR-duplicates of
    * an eval/benchmark document (token-set Jaccard ≥ `threshold`)? The
    * fuzzy complement of the exact n-gram overlap gate
    * ([[Corpus.decontaminate]]): paraphrased or lightly-edited benchmark
    * text shares few verbatim 8-grams but keeps a near-identical token
    * SET, so it slips the exact gate and lands here.
    *
    * `evalPred` marks the eval rows inside `docs`; returns, for every
    * CONTAMINATED raw document, (doc_id, n_eval_matches, max_jaccard) —
    * the count of eval documents it matches and its worst similarity.
    *
    * Asymmetric MinHash+LSH: [[minhashPairs]]'s machinery with the band
    * join CROSSING the corpus/eval boundary instead of self-joining.
    * Identical token sets collapse to one representative PER SIDE (the
    * self-join's collapse would swallow a corpus doc that exactly equals
    * an eval doc — the most contaminated case of all; per-side reps keep
    * it as a cross pair with identical signatures, caught by every band),
    * and members re-attach at the end via the setkey. Recall at the
    * threshold: minhash_sig is a pure function of the token set, so the
    * cross-side pair relation over (corpus ts, eval ts) bands exactly as
    * the q31 self-join does over the same sets — the exhaustive-recall
    * test extends to this operator directly (pinned in MlSpec; the q31
    * oracle-validity argument, which is what licenses the all-pairs
    * DuckDB oracle).
    *
    * Scale shape: same as [[minhashPairs]] — the band join carries
    * (rep, band, key) only; attach joins are shuffled 8-byte equi-joins
    * with no forced broadcast (the eval side is benchmark-sized and AQE
    * will broadcast it from measured size); the member expansion joins on
    * the setkey at the contaminated-rep grain, not the corpus grain. */
  def minhashMatchesAgainst(docs: DataFrame, evalPred: Column,
      threshold: Double = 0.95, numHashes: Int = 128, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val tokset = array_sort(array_distinct(tokens(col("text"))))
    val sided = docs
      .repartition(col("doc_id")) // parallelize the signature kernel (cf. minhashPairs)
      .select(col("doc_id"), evalPred.as("is_eval"), tokset.as("ts"))
      .withColumn("setkey", xxhash64(concat_ws(" ", col("ts"))))
    val reps = sided.groupBy("is_eval", "setkey")
      .agg(min("doc_id").as("rep"), first("ts").as("ts"))
    val withSig = reps.select(col("is_eval"), col("rep"),
      minhash_sig(col("ts"), numHashes).as("sig"))
    val bandCols = (0 until bands).map { bnd =>
      val slice = (0 until rows).map(r => col("sig").getItem(bnd * rows + r))
      struct(lit(bnd).as("band"), xxhash64(slice :+ lit(bnd): _*).as("key"))
    }
    val exploded = withSig
      .select(col("is_eval"), col("rep"), explode(array(bandCols: _*)).as("bk"))
      .select(col("is_eval"), col("rep"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = exploded.filter(!col("is_eval"))
      .select(col("band"), col("key"), col("rep").as("crep"))
      .join(exploded.filter(col("is_eval"))
        .select(col("band"), col("key"), col("rep").as("erep")), Seq("band", "key"))
      .select("crep", "erep").distinct()
    val ctoks = reps.filter(!col("is_eval")).select(col("rep").as("crep"), col("ts").as("ts_c"))
    val etoks = reps.filter(col("is_eval")).select(col("rep").as("erep"), col("ts").as("ts_e"))
    val matched = cand
      .join(ctoks, Seq("crep")).join(etoks, Seq("erep"))
      .withColumn("jaccard", round(jaccardSortedUdf(col("ts_c"), col("ts_e")), 4))
      .filter(col("jaccard") >= threshold)
      .select("crep", "erep", "jaccard")
    // Matches are counted at the eval DOCUMENT grain: an eval rep stands
    // for every eval doc sharing its token set.
    val evalSizes = sided.filter(col("is_eval"))
      .groupBy("setkey").agg(count(lit(1)).as("n_eval"))
      .join(reps.filter(col("is_eval")).select(col("setkey"), col("rep").as("erep")), Seq("setkey"))
      .select("erep", "n_eval")
    val perCrep = matched
      .join(evalSizes, Seq("erep"))
      .groupBy("crep")
      .agg(sum("n_eval").as("n_eval_matches"), max("jaccard").as("max_jaccard"))
    sided.filter(!col("is_eval")).select(col("doc_id"), col("setkey"))
      .join(reps.filter(!col("is_eval")).select(col("setkey"), col("rep").as("crep")), Seq("setkey"))
      .join(perCrep, Seq("crep"))
      .select(col("doc_id"), col("n_eval_matches"), col("max_jaccard"))
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
    * Set-similarity join via an INVERTED INDEX on shingles with the two
    * standard PPJoin-family prunings (cf. PAPERS.md; Bayardo et al.
    * AllPairs / Xiao et al. PPJoin), both lossless:
    *
    *  - PREFIX FILTER: under a global shingle order (document-frequency
    *    ascending, shingle-hash tie-break — rarest first), any pair with
    *    J(A,B) ≥ t shares at least one shingle among the first
    *    |X| − ⌈t·|X|⌉ + 1 shingles of EACH side (if the prefixes were
    *    disjoint, the intersection would be < ⌈t·max(|A|,|B|)⌉ ≤ the bound
    *    J ≥ t implies). So the candidate self-join runs over PREFIX postings
    *    only — a hot (frequent) shingle sorts last and drops out of most
    *    prefixes, killing the |posting|² blowup that made the unfiltered
    *    join the slowest query in the round-1 suite (59 s at sf0.1).
    *  - LENGTH FILTER: J(A,B) ≥ t ⇒ |A∩B| ≥ t·max ∧ |A∩B| ≤ min, hence
    *    t·|B| ≤ |A| and t·|A| ≤ |B| — applied inside the join condition so
    *    mismatched-size pairs never leave the join.
    *
    * Surviving candidate pairs are verified with the EXACT Jaccard over the
    * shingle arrays (attached per side by a join on doc id — candidate
    * volume post-pruning is tiny relative to the corpus), so the output is
    * identical to the naive all-pairs join.
    */
  /** The shared word-3-gram frame (doc_id, lang, sh, sz). Repartition
    * first: shingling is the CPU-heavy kernel and a small parquet input
    * plans 1 split — one narrow (doc_id, lang, text) shuffle buys 32-way
    * parallel shingles everywhere downstream. Exposed so composed pipelines
    * ([[graft.ml.Corpus.curate]]) can run the kernel ONCE and feed several
    * consumers. */
  def shingleFrame(docs: DataFrame): DataFrame = docs
    .repartition(col("doc_id"))
    .select(col("doc_id"), col("lang"), shingles3(col("text")).as("sh"))
    .withColumn("sz", size(col("sh")))

  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    ngramJaccardPairsFrom(shingleFrame(docs), threshold)

  /** q217's SpotSigs antecedent set — the q38 stopword list: spot
    * signatures anchor on words ad-injected boilerplate rarely contains,
    * which is the paper's point. */
  val SpotAntecedents: Seq[String] = Seq("the", "a", "of", "and", "with")

  /** SpotSigs signature frame (Theobald, Siddharth & Paepcke, "SpotSigs:
    * robust and efficient near duplicate detection in large web document
    * collections", SIGIR'08): for every occurrence of an ANTECEDENT
    * (stopword) at position i, the signature is the antecedent plus the
    * next `chainLen` NON-antecedent tokens — a signature set that skips
    * navigation/ad boilerplate (which is stopword-poor) and anchors on
    * natural-language spans, the property that made SpotSigs beat plain
    * shingling on news pages. Same (doc_id, lang, sh, sz) shape as
    * [[shingleFrame]], so the proven PPJoin prefix-pruned kernel
    * ([[ngramJaccardPairsFrom]]) runs unchanged over it.
    *
    * Chains shorter than asked (antecedent at the tail) are kept only if
    * nonempty (`x NOT LIKE '%:'` — spelled identically in the oracle);
    * per-position work is doc-bounded (the tail filter), never corpus. */
  def spotSigFrame(docs: DataFrame, chainLen: Int = 2): DataFrame = {
    val ants = SpotAntecedents.map(a => s"'$a'").mkString(", ")
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("lang"),
        expr(
          s"""array_distinct(filter(
             |  transform(split(text, ' '), (tok, i) ->
             |    CASE WHEN tok IN ($ants)
             |         THEN concat(tok, ':', array_join(
             |                slice(filter(slice(split(text, ' '), i + 2,
             |                                   size(split(text, ' '))),
             |                             x -> x NOT IN ($ants)),
             |                      1, $chainLen), ' '))
             |         ELSE NULL END),
             |  x -> x IS NOT NULL AND NOT x LIKE '%:'))""".stripMargin)
          .as("sh"))
      .withColumn("sz", size(col("sh")))
  }

  /** SpotSigs near-duplicate pairs: the signature frame above through
    * the exact-verified PPJoin kernel — tenth member of the dedup
    * family, the stopword-anchored flavor robust to boilerplate noise.
    * Output (a, b, jaccard ≥ threshold), q33's grain. */
  def spotSigPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    ngramJaccardPairsFrom(spotSigFrame(docs), threshold)

  /** Dedup-family agreement matrix — the audit a pipeline runs before
    * deciding which near-dup tiers to KEEP: for every pair of methods,
    * how many candidate pairs each finds, how many they share, and the
    * Jaccard of their pair SETS. A tier whose pairs are ⊂ another's
    * (agreement ≈ n_m1/n_m2) is redundant; a tier with near-zero
    * agreement prunes an independent duplication mode (the q223 κ idea
    * at the operator grain). Input: method-name → (a, b, …) pair
    * relation (directed relations should be normalized by the caller).
    * All counts are integers; agreement is one division (6 dp). The
    * self-join runs on pair KEYS (two 8-byte ids) — pair-set-sized,
    * never corpus-sized. */
  def dedupAgreement(methods: Map[String, DataFrame]): DataFrame = {
    require(methods.size >= 2, "need at least two methods")
    val tagged = methods.toSeq.sortBy(_._1).map { case (m, df) =>
      df.select(lit(m).as("method"),
        least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct()
    }.reduce(_ unionByName _)
    val counts = tagged.groupBy("method").agg(count(lit(1)).as("n"))
    val inter = tagged.as("x")
      .join(tagged.as("y"),
        col("x.a") === col("y.a") && col("x.b") === col("y.b") &&
          col("x.method") < col("y.method"))
      .groupBy(col("x.method").as("m1"), col("y.method").as("m2"))
      .agg(count(lit(1)).as("n_both"))
    val pairsOfMethods = counts.select(col("method").as("m1"), col("n").as("n_1"))
      .join(counts.select(col("method").as("m2"), col("n").as("n_2")),
        col("m1") < col("m2"))
    pairsOfMethods.join(inter, Seq("m1", "m2"), "left")
      .select(col("m1"), col("m2"), col("n_1"), col("n_2"),
        coalesce(col("n_both"), lit(0L)).as("n_both"))
      .withColumn("agreement",
        round(col("n_both").cast("double") /
          (col("n_1") + col("n_2") - col("n_both")).cast("double"), 6))
  }

  /** [[ngramJaccardPairs]] over a precomputed [[shingleFrame]]. */
  def ngramJaccardPairsFrom(sh: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val postings = sh
      .select(col("doc_id"), col("lang"), col("sz"),
        explode(col("sh")).as("shingle"))
      // hash the shingle: equi-join on a long key, not a string
      .select(col("doc_id"), col("lang"), col("sz"), xxhash64(col("shingle")).as("sk"))

    // Global (per-lang) shingle order: document frequency asc, sk asc.
    val docFreq = postings.groupBy("lang", "sk").agg(count(lit(1)).as("df"))
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val prefix = postings
      .join(docFreq, Seq("lang", "sk"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("lang"), col("doc_id")).orderBy(asc("df"), asc("sk"))))
      .filter(col("rnk") <= prefixLen)
      .select("lang", "sk", "doc_id", "sz")

    val l = prefix.select(col("lang").as("lang_a"), col("sk").as("sk_a"),
      col("doc_id").as("a"), col("sz").as("sz_a"))
    val r = prefix.select(col("lang").as("lang_b"), col("sk").as("sk_b"),
      col("doc_id").as("b"), col("sz").as("sz_b"))
    val candidates = l.join(r,
        col("lang_a") === col("lang_b") && col("sk_a") === col("sk_b") &&
          col("a") < col("b") &&
          col("sz_a").cast("double") >= lit(threshold) * col("sz_b") &&
          col("sz_b").cast("double") >= lit(threshold) * col("sz_a"))
      .select("a", "b")
      .distinct()

    val arrs = sh.select(col("doc_id"), col("sh"))
    candidates
      .join(arrs.select(col("doc_id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(arrs.select(col("doc_id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Near-dup threshold sensitivity sweep — the tuning audit run before
    * committing a dedup threshold: per candidate threshold, how many
    * pairs fire and how many documents they touch. The pair relation is
    * computed ONCE at the LOWEST threshold (PPJoin pruning at t_min is
    * lossless, so every higher threshold's pair set is a filter of it —
    * one kernel pass for the whole curve, never a per-threshold rerun);
    * the per-threshold expansion is a plan-time-constant array explode
    * on the PAIR grain (pairs × |T| rows, not corpus × |T|). Thresholds
    * with zero pairs still appear (that IS the signal the audit wants).
    * Counts compare the 4-dp-rounded Jaccard exactly as
    * [[ngramJaccardPairs]]'s own gate does. */
  def thresholdSweep(docs: DataFrame, thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val tArr = array(thresholds.distinct.sorted.map(lit): _*)
    val tagged = ngramJaccardPairs(docs, thresholds.min)
      .select(col("a"), col("b"), col("jaccard"), explode(tArr).as("threshold"))
      .filter(col("jaccard") >= col("threshold"))
    val perT = tagged.groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
    val docsAff = tagged
      .select(col("threshold"), explode(array(col("a"), col("b"))).as("doc_id"))
      .distinct()
      .groupBy("threshold").agg(count(lit(1)).as("n_docs_affected"))
    docs.sparkSession.range(1).select(explode(tArr).as("threshold"))
      .join(perT, Seq("threshold"), "left")
      .join(docsAff, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_affected"), lit(0L)).as("n_docs_affected"))
  }

  /** DIRECTED containment near-dups: (a, b, containment) with
    * containment = |sh(a) ∩ sh(b)| / |sh(a)| ≥ threshold and a ≠ b — the
    * asymmetric sibling of [[ngramJaccardPairs]]. A short document living
    * inside a longer one (syndicated article in a boilerplate wrapper, a
    * quoted excerpt) scores near-1 containment but low Jaccard, so
    * symmetric dedup misses exactly the subset case corpus curation most
    * wants caught (RefinedWeb/CCNet remove these).
    *
    * Lossless pruning, one-sided: if |A∩B| ≥ t·|A| then — pigeonhole in
    * the global (df asc, sk asc) shingle order — A shares one of its
    * (|A| − ⌈t·|A|⌉ + 1) RAREST shingles with B, so candidates come from
    * prefix(A) ⋈ full postings(B) (only the contained side is
    * prefix-cut; the containing side must stay fully indexed), plus the
    * size bound |B| ≥ ⌈t·|A|⌉ (B must hold the whole intersection).
    * Verification is the exact codegen'd array_intersect kernel on the
    * candidate pairs only. Lang-blocked and hash-keyed like the Jaccard
    * family; every shuffle carries 8-byte keys. */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    containmentPairsFrom(shingleFrame(docs), threshold)

  /** [[containmentPairs]] over a precomputed [[shingleFrame]]. */
  def containmentPairsFrom(sh: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val postings = sh
      .select(col("doc_id"), col("lang"), col("sz"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("lang"), col("sz"), xxhash64(col("shingle")).as("sk"))
    val docFreq = postings.groupBy("lang", "sk").agg(count(lit(1)).as("df"))
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val prefix = postings
      .join(docFreq, Seq("lang", "sk"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("lang"), col("doc_id")).orderBy(asc("df"), asc("sk"))))
      .filter(col("rnk") <= prefixLen)
      .select("lang", "sk", "doc_id", "sz")
    val l = prefix.select(col("lang").as("lang_a"), col("sk").as("sk_a"),
      col("doc_id").as("a"), col("sz").as("sz_a"))
    val r = postings.select(col("lang").as("lang_b"), col("sk").as("sk_b"),
      col("doc_id").as("b"), col("sz").as("sz_b"))
    val candidates = l.join(r,
        col("lang_a") === col("lang_b") && col("sk_a") === col("sk_b") &&
          col("a") =!= col("b") &&
          col("sz_b") >= ceil(lit(threshold) * col("sz_a")))
      .select("a", "b")
      .distinct()
    val arrs = sh.select(col("doc_id"), col("sh"), col("sz"))
    candidates
      .join(arrs.select(col("doc_id").as("a"), col("sh").as("sh_a"),
        col("sz").as("sz_a")), Seq("a"))
      .join(arrs.select(col("doc_id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .filter(col("sz_a") > 0)
      .withColumn("containment",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / col("sz_a"), 4))
      .filter(col("containment") >= threshold)
      .select("a", "b", "containment")
  }

  /** Winnowing fingerprint selection (op 97) — Schleimer, Wilkerson &
    * Aiken 2003 (the MOSS algorithm): from each document's sequence of
    * word-k-grams, select the MINIMUM gram of every sliding window of w
    * consecutive grams, dedup, and emit (doc_id, fingerprint). The
    * winnowing guarantee: any verbatim run of ≥ w+k-1 tokens shared by
    * two documents yields at least one SHARED selected fingerprint —
    * with density 2/(w+1) instead of every gram, the local-dedup /
    * plagiarism-detection index shrinks ~w/2× with zero recall loss on
    * long overlaps (MlSpec pins the guarantee).
    *
    * The minimum is taken in LEXICOGRAPHIC gram order rather than over a
    * 64-bit gram hash: the guarantee holds for ANY total order on grams
    * (the paper's hash only decorrelates selection from text statistics),
    * and a string order keeps the op DuckDB-oracle-expressible; swapping
    * in `rolling_hash` order is a one-line production variant. Windows
    * shorter than w (docs with < w grams) winnow to the single minimum
    * over what exists — every doc with ≥ 1 gram emits ≥ 1 fingerprint.
    *
    * Plan: a pure per-document map stage — the whole gram/window-min/dedup
    * chain is ONE codegen'd native kernel
    * ([[graft.functions.expressions.WinnowFps]]: zero-copy byte-range
    * grams + O(g) monotonic-deque sliding minimum), replacing the round-4
    * `transform(sequence…)` HOF formulation whose lambdas evaluated
    * interpreted per element (the round-2 finding); relation bit-identical
    * (MlSpec pins == the scalar reference, q94 stays oracle-green). No
    * shuffle until the caller aggregates fingerprints. */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    docs.select(col("doc_id"),
      explode(graft.functions.expressions.winnow_fps(col("text"), k, w))
        .as("fingerprint"))
  }

  /** C4/CCNet-style normalization fold for dedup keys: lowercase,
    * punctuation → space, whitespace runs collapsed, trimmed. Written in
    * the regex subset shared by Java regex and RE2 so the DuckDB oracle
    * runs the SAME patterns (the piiScrub discipline). Punctuation maps
    * to SPACE, not empty — "end.Start" must not glue into "endstart". */
  def normalizedText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Normalized exact dedup (the C4/RefinedWeb "fuzzy-exact" tier between
    * byte-exact dedup and MinHash): duplicate groups under
    * [[normalizedText]] — trivial reformattings (case, punctuation,
    * spacing) collapse; real edits don't. Output is corpus-grain:
    * (doc_id, keeper_id, group_size, is_dup), keeper = min doc_id of the
    * group, singletons keep themselves.
    *
    * Scale shape: same two-phase hash-first plan as [[exactByText]] — the
    * corpus-wide shuffle carries xxhash64(norm) keys only; normalized text
    * re-shuffles ONLY for hash groups with multiplicity > 1 (exact under
    * collisions), and the keeper re-attach join is bounded by the
    * duplicate volume, not the corpus. */
  def normalizedDupGroups(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"),
      normalizedText(col("text")).as("norm"))
      .withColumn("nh", xxhash64(col("norm")))
    val counts = hashed.groupBy("nh").agg(count(lit(1)).as("n"))
    val singles = hashed
      .join(counts.filter(col("n") === 1), Seq("nh"), "left_semi")
      .select(col("doc_id"), col("doc_id").as("keeper_id"),
        lit(1L).as("group_size"), lit(false).as("is_dup"))
    val multiRows = hashed
      .join(counts.filter(col("n") > 1), Seq("nh"), "left_semi")
    val multiGroups = multiRows.groupBy("nh", "norm")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("group_size"))
    val multi = multiRows.join(multiGroups, Seq("nh", "norm"))
      .select(col("doc_id"), col("keeper_id"), col("group_size"),
        (col("doc_id") =!= col("keeper_id")).as("is_dup"))
    singles.unionByName(multi)
  }

  /** Exact-substring duplicate SPANS (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr pass):
    * every maximal token range that is covered by a duplicated L-token
    * window, keeping the corpus-wide FIRST occurrence (min (doc_id, pos))
    * of each window as canonical. Output grain is one row per merged span:
    * (doc_id, span_start, span_end, span_len), token positions 0-based
    * inclusive — the ranges a span-removal rewrite would cut. Within-doc
    * repeats count: the second occurrence of a window inside one document
    * is a duplicate of its first.
    *
    * Scale shape (the 100 TB story): positional L-gram postings carry
    * (doc_id, pos, xxhash64(gram)) — 8-byte keys, never gram text (equal
    * to the string-keyed oracle absent 64-bit collisions; the q85 trade).
    * Occurrence stats are ONE hash agg on the gram key (count +
    * min-struct canonical — partial-agg friendly, no window/sort over the
    * postings), re-attached by ONE shuffled equi-join; duplicated grams
    * are a tiny survivor set at web scale. The interval merge
    * (gaps-and-islands) windows PARTITION BY doc_id over dup positions
    * only — per-doc state is bounded by document length, never corpus
    * size. No broadcast, no driver collection.
    */
  def duplicateSpans(docs: DataFrame, L: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(L >= 2, "window length must be >= 2")
    val grams = docs
      .repartition(col("doc_id")) // parallelize the shingle kernel (cf. minhashPairs)
      .select(col("doc_id"),
        posexplode(graft.functions.expressions.shingles_all_n(col("text"), L)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        xxhash64(col("col")).as("gh"))
    val stats = grams.groupBy("gh").agg(
      count(lit(1)).as("n"),
      min(struct(col("doc_id"), col("pos"))).as("first"))
    val dups = grams
      .join(stats.filter(col("n") > 1), Seq("gh"))
      .filter(!(col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos")))
      .select(col("doc_id"), col("pos"), (col("pos") + (L - 1)).as("en"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val prevMax = max(col("en")).over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    dups
      .withColumn("new_island",
        when(prevMax.isNull || col("pos") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("pos").as("span_start"), max("en").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }
}
