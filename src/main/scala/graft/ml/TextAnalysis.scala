package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline (task brief): language ID
  * (marker-token heuristic), quality scoring (length/punct/stopword ratios),
  * token counting (whitespace + BPE-ish regex), fingerprinting (rolling
  * hash — see graft.functions.expressions.RollingHash).
  *
  * Everything here is pure Column algebra (codegen'd, zero UDFs) — builtins
  * plus the native codegen'd `tokens_in_count` lexicon kernel (the
  * interpreted-HOF `filter(toks, isin)` scans were upgraded to it; see
  * [[graft.functions.expressions.TokensInCount]]) — and mirrored 1:1 in the
  * DuckDB oracle SQL. Ratios are exact small-integer rationals, rounded to
  * 4 dp on both sides.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "with")

  /** (lang, marker tokens) — evaluation order below encodes the tie-break. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "los", "que", "y"),
    "fr" -> Seq("le", "les", "et", "dans"),
    "zh" -> Seq("的", "是", "了", "在"))

  private def toks(text: Column): Column = split(text, " ")

  /** Lexicon hit count per document — the native codegen'd
    * [[graft.functions.expressions.TokensInCount]] kernel (upgraded from
    * the `size(filter(toks, isin))` HOF formulation, whose lambda ran
    * interpreted per token — the round-2 CodegenFallback finding; parity
    * pinned in MlSpec). */
  private def markerScore(text: Column, markers: Seq[String]): Column =
    graft.functions.expressions.tokens_in_count(text, markers)

  /** Language-ID scores + argmax prediction (ties broken by the fixed lang
    * order de < en < es < fr < zh, identical in the oracle SQL). */
  def langId(docs: DataFrame): DataFrame = {
    val scored = LangMarkers.foldLeft(docs.select(col("doc_id"), col("text"))) {
      case (df, (lang, markers)) => df.withColumn(s"s_$lang", markerScore(col("text"), markers))
    }
    val pred = when(col("s_de") >= greatest(col("s_en"), col("s_es"), col("s_fr"), col("s_zh")), "de")
      .when(col("s_en") >= greatest(col("s_es"), col("s_fr"), col("s_zh")), "en")
      .when(col("s_es") >= greatest(col("s_fr"), col("s_zh")), "es")
      .when(col("s_fr") >= col("s_zh"), "fr")
      .otherwise("zh")
    scored.select(col("doc_id"), pred.as("lang_pred"),
      col("s_de"), col("s_en"), col("s_es"), col("s_fr"), col("s_zh"))
  }

  /** Quality signals per document. */
  def quality(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t)
    val nChars = length(col("text"))
    val stop = markerScore(col("text"), Stopwords)
    val nonAlnum = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    docs.select(
      col("doc_id"),
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      round((nChars - (nTok - 1)).cast("double") / nTok, 4).as("avg_token_len"),
      round(stop.cast("double") / nTok, 4).as("stopword_ratio"),
      round(nonAlnum.cast("double") / nChars, 4).as("punct_ratio"))
  }

  /** Repetition quality signals (the Gopher-family filters: Rae et al.
    * 2021 §A1.1 — repeated content is the strongest single predictor of
    * low-quality web text): per document,
    *   top_token_frac   — occurrences of the most frequent token / tokens,
    *   uniq_token_frac  — distinct tokens / tokens,
    *   dup_3gram_frac   — 1 − distinct word-3-grams / total word-3-grams
    *                      (0.0 below 3 tokens).
    * Plan shape at 100 TB: the token stats go explode → two-level hash agg
    * (map-side combine collapses each doc's token stream before any
    * shuffle, same shape as Corpus.topTokens); the 3-gram distinct count
    * reuses the native `shingles3` kernel (already-distinct array, so it
    * is a size(), not another aggregation). No windows, no UDFs, no HOF
    * lambdas. */
  def repetition(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), max("c").as("top_tok"), count(lit(1)).as("n_uniq"))
    val grams = docs.select(col("doc_id"),
      size(Dedup.shingles3(col("text"))).as("n_3g_uniq"),
      (size(toks(col("text"))) - 2).as("n_3g"))
    counts
      .join(grams, Seq("doc_id"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("top_tok").cast("double") / col("n_tokens"), 4).as("top_token_frac"),
        round(col("n_uniq").cast("double") / col("n_tokens"), 4).as("uniq_token_frac"),
        round(
          when(col("n_3g") >= 1,
            lit(1.0) - col("n_3g_uniq").cast("double") / col("n_3g"))
            .otherwise(0.0), 4).as("dup_3gram_frac"))
  }

  /** Lexicon sentiment — the financial-news consumer's classic first
    * analysis (Loughran–McDonald-style word lists; the fixture vocabulary
    * stands in for the LM lexicon): per document, positive/negative hit
    * counts at the token grain and the normalized polarity
    * `(n_pos - n_neg) / n_tokens`, labeled by sign. A pure map stage that
    * pipelines into the scan — no explode, no shuffle; the two lexicon
    * passes run through the native codegen'd `tokens_in_count` kernel
    * (upgraded this round from interpreted HOF `filter` lambdas — the
    * round-2 CodegenFallback finding; same upgrade path shingles_n and
    * minhash_sig took; parity pinned in MlSpec). */
  def sentiment(docs: DataFrame,
      positive: Seq[String] = Seq("fast", "big", "value"),
      negative: Seq[String] = Seq("slow", "small", "error"),
      keyCols: Seq[String] = Seq("doc_id")): DataFrame = {
    val t = toks(col("text"))
    val nPos = markerScore(col("text"), positive)
    val nNeg = markerScore(col("text"), negative)
    val polarity = round((nPos - nNeg).cast("double") / size(t), 4)
    docs.select(keyCols.map(col) ++ Seq(
      nPos.as("n_pos"),
      nNeg.as("n_neg"),
      polarity.as("polarity"),
      when(nPos > nNeg, "pos").when(nNeg > nPos, "neg")
        .otherwise("neutral").as("label")): _*)
  }

  /** CCNet-style LM quality proxy (Wenzek et al. 2020 use LM perplexity
    * to rank web text; the unigram model is its oracle-expressible
    * degenerate case): per document, the mean corpus-unigram log-prob
    * `sum(k_t * ln(c_t / N)) / sum(k_t)` over its tokens — word-soup and
    * rare-token pages score low, fluent/common text scores high.
    *
    * Plan shape at 100 TB: per-doc token counts collapse in a two-level
    * hash agg (map-side combine — the shuffle carries (doc, tok, k), not
    * the token stream); the unigram table is vocabulary-sized and joins
    * on the token key (AQE broadcasts from measured size, no forced
    * broadcast); the corpus total is a 1-row broadcast cross join. */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toksE = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val dt = toksE.groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("k"))
    val freq = toksE.groupBy("tok").agg(count(lit(1)).cast("double").as("c"))
    val total = freq.agg(sum("c").as("n_total"))
    dt.join(freq, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(
        sum("k").cast("long").as("n_tokens"),
        round(sum(col("k") * log(col("c") / col("n_total"))) / sum("k"), 4)
          .as("mean_logp"))
  }

  /** Quality-gate calibration sweep: for each candidate threshold over a
    * per-document quality score (column `mean_logp`, e.g.
    * [[unigramLogProb]]'s), the document AND token survival of the gate
    * `score ≥ t` — the curve a pipeline owner reads before committing a
    * filter threshold (the q165 sensitivity-sweep pattern applied to the
    * quality axis; CCNet/Gopher pipelines publish exactly this trade-off).
    * Comparisons run on the 4-dp-rounded published score, so the decile
    * cut is bit-identical across engines.
    *
    * Plan: the scored relation cross-joins a broadcast |thresholds|-row
    * dim (docs × ~7 rows, map-side), then ONE hash agg per threshold —
    * no window, no second scan per threshold. */
  def qualityGateSweep(scored: DataFrame, thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val spark = scored.sparkSession
    import spark.implicits._
    val th = thresholds.toDF("threshold")
    scored.crossJoin(broadcast(th))
      .groupBy("threshold")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("mean_logp") >= col("threshold"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(col("n_tokens")).as("n_tokens_total"),
        sum(when(col("mean_logp") >= col("threshold"), col("n_tokens"))
          .otherwise(0L)).as("n_tokens_kept"))
      .select(col("threshold"), col("n_docs"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_docs").cast("double"), 4)
          .as("doc_keep_frac"),
        col("n_tokens_total"), col("n_tokens_kept"),
        round(col("n_tokens_kept").cast("double") /
          col("n_tokens_total").cast("double"), 4).as("token_keep_frac"))
  }

  /** Inter-gate agreement audit — Cohen's κ (Cohen 1960) between two
    * binary quality raters over the same corpus: how much two filter
    * signals (here the q55 unigram-LM gate and the q87 bigram-LM gate)
    * agree BEYOND the agreement their marginal pass rates already
    * imply. κ ≈ 1 means the second gate is redundant; κ ≈ 0 means it
    * prunes an independent failure mode — the decision input for
    * whether a pipeline needs both. Both inputs are (doc_id, …,
    * mean_logp) scored frames; the universe is their doc intersection
    * (documented: single-token docs have no bigram score).
    *
    * Exactness: the contingency counts n11/n10/n01/n00 are integers on
    * the 4-dp published scores, and κ uses the integer closed form
    * 2(n11·n00 − n10·n01) / ((n11+n10)(n10+n00) + (n11+n01)(n01+n00))
    * — one double division, hash-exact (a po/pe spelling would sum
    * floats). One hash agg + one 1-row projection. */
  def gateAgreement(uniScored: DataFrame, biScored: DataFrame,
      tUni: Double, tBi: Double): DataFrame = {
    val a = uniScored.select(col("doc_id"),
      (col("mean_logp") >= tUni).as("pa"))
    val b = biScored.select(col("doc_id"),
      (col("mean_logp") >= tBi).as("pb"))
    a.join(b, Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pa") && col("pb"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("pa") && !col("pb"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("pa") && col("pb"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("pa") && !col("pb"), 1L).otherwise(0L)).as("n00"))
      .select(col("n_docs"), col("n11"), col("n10"), col("n01"), col("n00"),
        round((col("n11") + col("n00")).cast("double") /
          col("n_docs").cast("double"), 6).as("po"),
        round((lit(2L) * (col("n11") * col("n00") - col("n10") * col("n01")))
          .cast("double") /
          ((col("n11") + col("n10")) * (col("n10") + col("n00")) +
            (col("n11") + col("n01")) * (col("n01") + col("n00"))).cast("double"),
          6).as("kappa"))
  }

  /** Per-document token-entropy quality signal: the Shannon entropy of a
    * document's OWN unigram distribution, `H = ln(n) - sum(k ln k) / n`
    * over per-doc token counts k (algebraically identical to
    * `-sum(p ln p)` but every ln argument is an exact integer-valued
    * double, so engine and oracle compute bit-identical operands — the
    * q55 discipline), plus the ln(n_uniq)-normalized variant in [0, 1].
    * Low H flags the degenerate repetition Gopher's fraction heuristics
    * (q51) see only partially — a doc alternating two tokens has
    * top_token_frac 0.5 but entropy ln 2; a keyword-stuffing page scores
    * near 0. Complements q55/q87: those score AGAINST a corpus model,
    * this is model-free and per-doc.
    *
    * Plan shape: one two-level hash agg (doc, tok) → doc — the shuffle
    * carries per-doc distinct-token counts, never the token stream; a
    * pure map stage after. No window, no join, no UDF. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val dt = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("k"))
    dt.groupBy("doc_id")
      .agg(
        sum("k").cast("long").as("n_tokens"),
        count(lit(1)).as("n_uniq"),
        (log(sum("k")) - sum(col("k") * log(col("k"))) / sum("k")).as("h"))
      .select(col("doc_id"), col("n_tokens"), col("n_uniq"),
        round(col("h"), 4).as("entropy"),
        round(when(col("n_uniq") > 1, col("h") / log(col("n_uniq").cast("double")))
          .otherwise(lit(0.0)), 4).as("norm_entropy"))
  }

  /** Bigram LM quality — [[unigramLogProb]]'s next rung on the CCNet
    * ladder (Wenzek et al. 2020 rank with a 5-gram KenLM; the bigram MLE
    * is the largest n that stays oracle-expressible): per document the
    * mean conditional log-prob `sum(k * ln(c(w1,w2) / ctx(w1))) / sum(k)`
    * over its bigrams, where c is the corpus bigram count and ctx(w1) the
    * count of w1 as a LEFT context (so p(·|w1) sums to 1 exactly). The
    * model is trained on the scored corpus itself, so every scored bigram
    * has c ≥ 1 and no smoothing is needed — word-salad (rare
    * transitions) scores low even when every individual token is common,
    * which is exactly the failure mode the unigram proxy cannot see.
    *
    * Plan shape: bigram pairing is arrays_zip over two slice views
    * (codegen'd builtins — the q78 shape; shingles_n dedups so it cannot
    * COUNT); per-doc bigram counts collapse in a two-level hash agg (the
    * shuffle carries (doc, w1, w2, k), never the token stream). The
    * left-context totals ride a WINDOW over the vocabulary²-bounded
    * model table — sum(c) over (partition by w1) — rather than a second
    * aggregation of a corpus-derived frame, so the corpus is scanned
    * ONCE (a re-agg subtree defeats Spark's exchange reuse and re-scans
    * the corpus; the window partition is a token's distinct-follower
    * set, vocabulary-bounded, never document-bounded). One model join on
    * the pair key (string keys here — the production swap-in is an
    * 8-byte xxhash64(w1, w2) join key, the q33 discipline). All counts
    * are integers carried in doubles, so c and ctx are EXACT on both
    * engine and oracle sides; docs with < 2 tokens have no bigrams and
    * are absent by definition. */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = toks(col("text"))
    val pairs = docs
      .select(col("doc_id"), explode(arrays_zip(
        slice(t, lit(1), size(t) - 1).as("w1"),
        slice(t, lit(2), size(t) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // No-op semantically (the zipped slices are equal-length, so
      // arrays_zip never pads): stated explicitly so BOTH consumers of
      // `db` (the doc-grain join side and the model side) infer the SAME
      // null filters — otherwise their scan subtrees canonicalize
      // differently and exchange reuse fails, re-scanning the corpus.
      .filter(col("w1").isNotNull && col("w2").isNotNull)
    val db = pairs.groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).cast("double").as("k"))
    val model = db.groupBy("w1", "w2").agg(sum("k").as("c"))
      .withColumn("ctx", sum("c").over(Window.partitionBy("w1")))
    db.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(
        sum("k").cast("long").as("n_bigrams"),
        round(sum(col("k") * log(col("c") / col("ctx"))) / sum("k"), 4)
          .as("mean_logp"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney, ICASSP'95; the
    * Chen & Goodman '98 formulation with one fixed discount): P(w2|w1) =
    * (max(c(w1w2)−D, 0) + D·N1+(w1·)·Pcont(w2)) / c(w1·) with the
    * continuation model Pcont(w2) = N1+(·w2)/|bigram types| — the
    * smoothing upgrade of [[bigramLogProb]] whose MLE assigns observed-
    * but-rare continuations too much mass. Same output grain as q87:
    * per-document bigram count and mean log probability.
    *
    * Scale shape: identical to q87 — the doc-grain bigram agg collapses
    * map-side; the model tables (c12 / context / continuation counts)
    * are vocab-grain aggs joined back by equi-keys; the |types| total is
    * a 1-row broadcast attach. Every count is an exact-integer-valued
    * double and the probability expression is mirrored operand-for-
    * operand in the oracle; round(…,4) absorbs sum order. Observed
    * bigrams always have c12 ≥ 1 > D−… and Pcont > 0, so the log is
    * total. */
  def knBigramLogProb(docs: DataFrame, discount: Double = 0.75): DataFrame = {
    val t = toks(col("text"))
    val pairs = docs
      .select(col("doc_id"), explode(arrays_zip(
        slice(t, lit(1), size(t) - 1).as("w1"),
        slice(t, lit(2), size(t) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .filter(col("w1").isNotNull && col("w2").isNotNull) // q87 convention
    val db = pairs.groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).cast("double").as("k"))
    val cb = db.groupBy("w1", "w2").agg(sum("k").as("c12"))
    val ctx = cb.groupBy("w1").agg(sum("c12").as("ctx"),
      count(lit(1)).cast("double").as("nf"))
    val cont = cb.groupBy("w2").agg(count(lit(1)).cast("double").as("nb"))
    val types = cb.agg(count(lit(1)).cast("double").as("nt"))
    val d = lit(discount)
    db.join(cb, Seq("w1", "w2")).join(ctx, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("p",
        (greatest(col("c12") - d, lit(0.0)) +
          d * col("nf") * (col("nb") / col("nt"))) / col("ctx"))
      .groupBy("doc_id")
      .agg(sum("k").cast("long").as("n_bigrams"),
        round(sum(col("k") * log(col("p"))) / sum("k"), 4).as("mean_logp_kn"))
  }

  /** PII patterns (Dolma/C4-family scrubbing), written in the common
    * subset of Java regex (Spark) and RE2 (DuckDB) so the oracle runs the
    * SAME patterns: character classes, bounded repetition and `\b` only —
    * no lookaround (RE2 has none). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  /** PII detection + redaction (the pre-training scrub every public
    * web-text pipeline runs — C4 removed pages, Dolma masks spans; this
    * masks): emails → `<EMAIL>`, IPv4 → `<IP>`, phone numbers →
    * `<PHONE>`, plus per-kind match counts.
    *
    * Scrub order is load-bearing: emails first (an address can contain
    * digit runs that the looser phone/IP patterns would shred), then IPs,
    * then phones; the replacement tokens contain no scrubbable substrings,
    * so the pass is idempotent (pinned in SearchSpec). All six regex ops
    * are codegen'd builtins over one projection — no shuffle, no UDF;
    * at 100 TB this is a pure map stage that pipelines into whatever
    * follows. */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).as("n_email"),
      regexp_count(col("text"), lit(Ipv4Re)).as("n_ip"),
      regexp_count(col("text"), lit(PhoneRe)).as("n_phone"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("clean_text"))

  /** BPE-ish token regex: letter runs, digit runs, or single non-space. */
  val TokenRegex = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Token counts: whitespace tokens, regex tokens, distinct tokens. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toks(col("text"))).as("ws_tokens"),
      regexp_count(col("text"), lit(TokenRegex)).as("re_tokens"),
      size(array_distinct(toks(col("text")))).as("uniq_tokens"))

  /** Document policy gate (C4 §2.1 / Dolma-style corpus cleanup): every
    * public web-text pipeline runs a rule gate BEFORE the statistical
    * filters — a source/domain blocklist plus a banned-lexicon share cut
    * (C4 drops any page with a "List of Dirty, Naughty ... Words" hit;
    * Dolma ships explicit URL blocklists). Returns EVERY document with its
    * evidence and a verdict, so the gate composes as `filter(verdict =
    * 'kept')` while the audit view (what was dropped and why) is the same
    * frame — the shape a datasheet / appeals process needs.
    *
    * Verdict precedence: source blocklist first (domain-level policy
    * outranks content evidence), then the lexicon share cut, else kept.
    *
    * Plan shape at 100 TB: a pure map stage — the blocklist compiles to a
    * literal IN set (policy blocklists are config-sized; a multi-million-
    * entry list would swap in a broadcast-dim left join on `source`, the
    * q04 robots shape) and the banned count runs through the native
    * codegen'd `tokens_in_count` kernel, so the gate pipelines into the
    * scan with no shuffle, no UDF, and prunes mass before anything
    * downstream shuffles. The share compare reuses the exact int/int
    * double both sides round identically. */
  def policyGate(docs: DataFrame,
      blockedSources: Seq[String] = Seq("src13", "src4"),
      banned: Seq[String] = Seq("error", "slow"),
      maxBannedFrac: Double = 0.12): DataFrame = {
    val nBanned = markerScore(col("text"), banned)
    val frac = col("n_banned").cast("double") / col("n_tokens")
    docs
      .select(col("doc_id"), col("source"),
        nBanned.as("n_banned"), size(toks(col("text"))).as("n_tokens"))
      .select(col("doc_id"), col("source"), col("n_banned"), col("n_tokens"),
        round(frac, 4).as("banned_frac"),
        when(col("source").isInCollection(blockedSources), "blocked_source")
          .when(frac > maxBannedFrac, "blocked_lexicon")
          .otherwise("kept").as("verdict"))
  }

  /** Gopher's stop-word list (Rae et al. 2021 §A1.1 rule 7). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher rule gate (Rae et al. 2021 §A1.1) — the
    * heuristic-rule sibling of the repetition fractions (q51) and the
    * statistical filters (q55/q122): per document,
    *   1. word count within [minWords, maxWords]
    *   2. mean word length within [minMeanWlen, maxMeanWlen]
    *   3. symbol-to-word ratio ('#' chars + '...' occurrences) ≤ max
    *   4. fraction of lines starting with a bullet ('- ') ≤ max
    *   5. fraction of lines ending in '...' ≤ max
    *   6. fraction of words containing ≥1 alphabetic char ≥ min
    *   7. ≥ minStopHits occurrences of the Gopher stop-word list
    * Output is the audit view AND the filter in one frame (the q113
    * policyGate shape): every signal + the composed `kept` verdict.
    *
    * Word-level stats run on `body` (newlines folded to spaces — one
    * whitespace token grammar for rules 1/2/3/6/7); line-level stats
    * (4/5) run on the raw text via multiline-anchored regex counts —
    * `(?m)^- ` / `(?m)\.\.\.$` — so no per-line explode ever happens.
    * Alphabetic-word counting uses the leading-space trick: every token
    * of ' '||body is preceded by exactly one space, so non-overlapping
    * matches of ' [^ ]*[a-z][^ ]*' count exactly the tokens containing a
    * letter (no interpreted HOF lambda). Stop hits ride the native
    * codegen'd `tokens_in_count` kernel.
    *
    * Plan shape at 100 TB: a pure map stage — builtins + one native
    * kernel, no shuffle, no UDF, no explode; rule comparisons are on
    * exact small-integer rationals (int/int division is the same IEEE
    * double in the oracle — the q113 share-compare discipline), rounded
    * to 4 dp only for display. */
  def gopherGate(docs: DataFrame,
      minWords: Int = 20, maxWords: Int = 10000,
      minMeanWlen: Double = 3.0, maxMeanWlen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): DataFrame = {
    val body = regexp_replace(col("text"), "\n", " ")
    val nWords = size(split(body, " ")).cast("double")
    val nonWs = length(regexp_replace(body, " ", "")).cast("double")
    val meanWlen = nonWs / nWords
    val hashes = length(body) - length(regexp_replace(body, "#", ""))
    val ellipses = (length(body) - length(regexp_replace(body, "\\.\\.\\.", ""))) / 3
    val symbolRatio = (hashes + ellipses).cast("double") / nWords
    val nLines = size(split(col("text"), "\n")).cast("double")
    val bulletFrac =
      size(regexp_extract_all(col("text"), lit("(?m)^- "), lit(0))).cast("double") / nLines
    val ellipsisFrac =
      size(regexp_extract_all(col("text"), lit("(?m)\\.\\.\\.$"), lit(0))).cast("double") / nLines
    val alphaFrac =
      size(regexp_extract_all(concat(lit(" "), body), lit(" [^ ]*[a-z][^ ]*"), lit(0)))
        .cast("double") / nWords
    val nStop = graft.functions.expressions.tokens_in_count(body, GopherStops)
    docs.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      round(meanWlen, 4).as("mean_wlen"),
      round(symbolRatio, 4).as("symbol_ratio"),
      round(bulletFrac, 4).as("bullet_frac"),
      round(ellipsisFrac, 4).as("ellipsis_frac"),
      round(alphaFrac, 4).as("alpha_frac"),
      nStop.cast("long").as("n_stop"),
      (nWords >= minWords && nWords <= maxWords &&
        meanWlen >= minMeanWlen && meanWlen <= maxMeanWlen &&
        symbolRatio <= maxSymbolRatio &&
        bulletFrac <= maxBulletFrac &&
        ellipsisFrac <= maxEllipsisFrac &&
        alphaFrac >= minAlphaFrac &&
        nStop >= minStopHits).as("kept"))
  }

  /** Unicode normalization pass — crawled web text arrives in mixed
    * normalization forms (decomposed combining sequences from some CMSes,
    * precomposed from others), which silently breaks exact dedup, token
    * matching, and BM25 term equality. `text_nfc` is the NFC fold every
    * downstream operator should key on; `text_folded` additionally strips
    * diacritics (the search-side "café" == "cafe" recall fold); `changed`
    * flags rows the NFC fold actually rewrote (audit: how dirty is the
    * corpus?).
    *
    * Plan shape at 100 TB: a pure map stage over two native codegen'd
    * expressions ([[graft.functions.expressions.NfcNormalize]] /
    * `StripAccents`) with an ASCII zero-copy fast path — for the typical
    * English crawl slice this is a byte-scan per row, no decode, no
    * allocation, no shuffle. */
  def unicodeNormalize(docs: DataFrame): DataFrame = {
    val nfc = graft.functions.expressions.nfc_normalize(col("text"))
    docs.select(
      col("doc_id"),
      nfc.as("text_nfc"),
      graft.functions.expressions.strip_accents(nfc).as("text_folded"),
      (nfc =!= col("text")).as("changed"))
  }

  /** Compression-ratio quality signal (the zlib heuristic next to q51's
    * Gopher fractions): templated/repetitive spam deflates far below
    * natural prose, so ratio = deflate_len/n_bytes separates them with no
    * model. No DuckDB oracle exists for DEFLATE (rows-only entry) — the
    * kernel is pinned against java.util.zip directly plus ordering
    * properties in SearchSpec.
    *
    * Plan shape at 100 TB: pure map stage, one codegen'd kernel call per
    * row; ratio arithmetic is exact-int division both sides. */
  def compressionRatio(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      graft.functions.expressions.deflate_len(col("text")).cast("long").as("n_deflate"))
      .withColumn("ratio",
        round(col("n_deflate").cast("double") / col("n_bytes"), 4))

  /** Flesch reading-ease audit (Flesch 1948; the readability member of
    * the quality-signal family next to the Gopher gate): 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words).
    *
    * Deterministic proxies, mirrored regex-for-regex in the oracle:
    * words = whitespace tokens; sentences = runs of sentence-final
    * punctuation `[.!?]+` (floored at 1 — an unpunctuated document is
    * one long sentence); syllables = vowel-group runs `[aeiouy]+` (the
    * standard heuristic; the corpus is lowercase). Pure map stage —
    * three codegen'd regexp counts + one arithmetic projection; every
    * division has integer-valued-double operands, constants are exact
    * decimal literals on both sides, round(…,4) output. */
  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04): per-document
    * PageRank over the token co-occurrence graph (adjacency window 2,
    * undirected — each edge contributes both directions), WS(v) = (1−d) +
    * d·Σ_{u→v} WS(u)/outdeg(u), init 1.0, `iters` fixed unrolled rounds
    * (the q69/q143 template with doc_id joined into every key, so ONE plan
    * ranks every document's graph at once — per-doc graphs never visit the
    * driver). Undirected symmetry means every node has outdeg ≥ 1: no
    * dangling-mass term. Tokens with no non-self neighbor (single-token
    * or fully-repetitive documents) have no node and no keyword row.
    *
    * Scale shape: edges/out-degrees/scores are all (doc_id, term)-keyed
    * hash aggs and equi-joins — the corpus text rides only the first
    * tokenize+explode map stage; each round shuffles 8-byte-ish keyed
    * score rows. The final top-`k` window runs on the PER-DOCUMENT
    * grain (bounded frames, op-49 rule), keyed (rounded score DESC,
    * term) so the cut is total-order deterministic; the oracle unrolls
    * the identical rounds (q69 float discipline, 6-dp absorb). */
  def textrankKeywords(docs: DataFrame, iters: Int = 3,
      damping: Double = 0.85, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = toks(col("text"))
    val adj = docs
      .select(col("doc_id"), explode(arrays_zip(
        slice(t, lit(1), size(t) - 1).as("a"),
        slice(t, lit(2), size(t) - 1).as("b"))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val edges = adj.select(col("doc_id"), col("a").as("src"), col("b").as("dst"))
      .union(adj.select(col("doc_id"), col("b").as("src"), col("a").as("dst")))
      .distinct()
    val outdeg = edges.groupBy("doc_id", "src")
      .agg(count(lit(1)).cast("double").as("outd"))
    val nodes = edges.select(col("doc_id"), col("src").as("term")).distinct()
    var scores = nodes.withColumn("score", lit(1.0))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(outdeg, Seq("doc_id", "src"))
        .join(scores.withColumnRenamed("term", "src"), Seq("doc_id", "src"))
        .groupBy(col("doc_id"), col("dst").as("term"))
        .agg(sum(col("score") / col("outd")).as("in_mass"))
      scores = nodes.join(contrib, Seq("doc_id", "term"), "left")
        .select(col("doc_id"), col("term"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("score"))
    }
    scores
      .select(col("doc_id"), col("term"), round(col("score"), 6).as("score"))
      .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term").asc)))
      .filter(col("rk") <= k)
  }

  def readability(docs: DataFrame): DataFrame = {
    val words = size(split(col("text"), " ")).cast("double")
    val sentences = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1)).cast("double")
    val syllables = regexp_count(col("text"), lit("[aeiouy]+")).cast("double")
    docs.select(col("doc_id"),
      words.cast("long").as("n_words"),
      sentences.cast("long").as("n_sentences"),
      syllables.cast("long").as("n_syllables"),
      round(lit(206.835) - lit(1.015) * (words / sentences)
        - lit(84.6) * (syllables / words), 4).as("flesch"))
  }
}
