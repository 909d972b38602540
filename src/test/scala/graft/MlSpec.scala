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

  test("native minhash_sig: codegen == driver-side kernel; min-structure holds") {
    val df = Seq(
      (1L, Array("alpha", "beta", "gamma")),
      (2L, Array("alpha", "beta", "gamma")), // identical set → identical sig
      (3L, Array("alpha", "beta")),          // subset → elementwise sig_3 >= sig_1? no — but min over fewer tokens is >= min over more
      (4L, Array.empty[String])).toDF("id", "ts")
    val rows = df.select($"id", minhash_sig($"ts", 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // codegen path vs the same kernel invoked driver-side
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val driver = graft.functions.NativeOps.minhashSig(
      new GenericArrayData(Array("alpha", "beta", "gamma").map(UTF8String.fromString): Array[Any]),
      16).toLongArray.toSeq
    assert(rows(1L) === driver)
    assert(rows(1L) === rows(2L), "identical token sets must produce identical signatures")
    // dropping a token can only RAISE (or keep) each minimum
    assert(rows(3L).zip(rows(1L)).forall { case (sub, full) => sub >= full })
    assert(rows(4L).forall(_ == Long.MaxValue), "empty set → identity signature")
  }

  test("native shingles3: codegen == split(' ')-semantics reference, dedup + order") {
    // Reference = the retired round-1 UDF kernel, verbatim: Java split(' ')
    // semantics (empty tokens between doubled spaces, trailing empties
    // dropped), distinct shingles in first-occurrence order.
    def ref(text: String): Seq[String] = {
      val t = text.split(' ')
      if (t.length < 3) Seq.empty
      else {
        val out = new scala.collection.mutable.LinkedHashSet[String]
        var i = 0
        while (i + 2 < t.length) { out += (t(i) + " " + t(i + 1) + " " + t(i + 2)); i += 1 }
        out.toSeq
      }
    }
    val cases = Seq(
      "a b c d e",
      "a b c a b c a b c",       // duplicate shingles collapse, order kept
      "a  b c",                  // doubled space → empty token
      " a b c",                  // leading empty token
      "a b c   ",                // trailing spaces drop
      "a b", "a", "", "   ",
      "wörter über straße zwei", // multi-byte UTF-8
      "的 是 了 在 我")
    val got = cases.toDF("text")
      .select($"text", graft.ml.Dedup.shingles3($"text").as("sh"))
      .as[(String, Seq[String])].collect().toMap
    for (c <- cases) assert(got(c) === ref(c), s"shingles diverge on '$c'")
    // driver-side kernel == codegen path
    import org.apache.spark.unsafe.types.UTF8String
    val driver = graft.functions.NativeOps.shinglesN(UTF8String.fromString(cases(1)), 3)
    assert((0 until driver.numElements()).map(driver.getUTF8String(_).toString)
      === got(cases(1)))
    // NULL text → NULL array (documented unary-expression semantics)
    val nullRow = Seq((1L, null: String)).toDF("id", "text")
      .select(graft.ml.Dedup.shingles3($"text")).collect().head
    assert(nullRow.isNullAt(0))

    // Native tokens_in_count == the retired HOF formulation
    // size(filter(split(text,' '), isin(words))) on every adversarial
    // tokenization case above plus lexicon-specific ones (codegen path —
    // projection over a DataFrame — against the builtin HOF evaluated on
    // the same rows).
    val lex = Seq("a", "straße", "的")
    val lexCases = cases ++ Seq("aa a a", "a  a", "ab ba a", "straße 的 x")
    val parity = lexCases.toDF("text")
      .select($"text",
        tokens_in_count($"text", lex).as("native"),
        size(filter(split($"text", " "),
          x => x.isin(lex.map(w => w: Any): _*))).as("hof"))
      .as[(String, Int, Int)].collect()
    for ((c, n, h) <- parity) assert(n === h, s"tokens_in_count diverges on '$c'")
    // NULL text → NULL count; driver-side eval == codegen
    val nullCnt = Seq((1L, null: String)).toDF("id", "text")
      .select(tokens_in_count($"text", lex)).collect().head
    assert(nullCnt.isNullAt(0))
    assert(graft.functions.NativeOps.countTokensIn(
      org.apache.spark.unsafe.types.UTF8String.fromString("aa a a"),
      lex.map(_.getBytes("UTF-8")).toArray) === 2)

    // Generalized widths (shingles_n): n=1 = distinct tokens in order,
    // n=2 bigrams, n=8 (the decontamination grain), n > tokens = empty.
    import graft.functions.expressions.shingles_n
    val t = "a b c a b c d e f"
    val byN = Seq(1, 2, 8, 10).map { n =>
      n -> Seq(t).toDF("text").select(shingles_n($"text", n)).as[Seq[String]].head()
    }.toMap
    assert(byN(1) === Seq("a", "b", "c", "d", "e", "f"))
    assert(byN(2) === Seq("a b", "b c", "c a", "c d", "d e", "e f"))
    assert(byN(8) === Seq("a b c a b c d e", "b c a b c d e f"))
    assert(byN(10) === Seq.empty)
  }

  test("lexicon sentiment matches hand truth (counts, polarity, label)") {
    val docs = Seq(
      (1L, "fast big value win"),       // 3 pos, 0 neg → 0.75 pos
      (2L, "slow slow error x y z"),    // 0 pos, 3 neg → -0.5 neg
      (3L, "fast slow a b"),            // 1-1 → 0.0 neutral
      (4L, "nothing scored here"))      // 0-0 → neutral
      .toDF("doc_id", "text")
    val got = graft.ml.TextAnalysis.sentiment(docs)
      .as[(Long, Int, Int, Double, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 3, 0, 0.75, "pos"),
      (2L, 0, 3, -0.5, "neg"),
      (3L, 1, 1, 0.0, "neutral"),
      (4L, 0, 0, 0.0, "neutral")))
  }

  test("policyGate: blocklist precedence, strict lexicon threshold, audit evidence") {
    val docs = Seq(
      (1L, "error error slow x", "okA"),  // 3/4 banned → blocked_lexicon
      (2L, "all clean text here", "badB"), // blocked source, zero hits
      (3L, "error a b c", "badB"),        // source precedence over lexicon
      (4L, "all clean text here", "okA"), // kept
      (5L, "error a a a", "okA"))         // 1/4 == threshold → kept (strict >)
      .toDF("doc_id", "text", "source")
    val got = graft.ml.TextAnalysis.policyGate(docs,
      blockedSources = Seq("badB"), banned = Seq("error", "slow"),
      maxBannedFrac = 0.25)
      .as[(Long, String, Int, Int, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "okA", 3, 4, 0.75, "blocked_lexicon")))
    assert(got(2L) === ((2L, "badB", 0, 4, 0.0, "blocked_source")))
    assert(got(3L) === ((3L, "badB", 1, 4, 0.25, "blocked_source")))
    assert(got(4L) === ((4L, "okA", 0, 4, 0.0, "kept")))
    assert(got(5L) === ((5L, "okA", 1, 4, 0.25, "kept")))
  }

  test("repetition signals match hand truth (Gopher-family filter)") {
    val docs = Seq(
      (1L, "a a a a"),          // top=4/4, uniq=1/4, 3grams: {a a a} of 2 → dup 0.5
      (2L, "a b c d"),          // top=1/4, uniq=4/4, 3grams: {abc,bcd} of 2 → dup 0
      (3L, "x y x y x y"),      // top=3/6, uniq=2/6, 3grams: {xyx,yxy} of 4 → dup 0.5
      (4L, "p q"),              // <3 tokens → dup 0.0
      (5L, "solo")
    ).toDF("doc_id", "text")
    val got = graft.ml.TextAnalysis.repetition(docs)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === ((4L, 1.0, 0.25, 0.5)))
    assert(got(2L) === ((4L, 0.25, 1.0, 0.0)))
    assert(got(3L) === ((6L, 0.5, round2(2.0 / 6), 0.5)))
    assert(got(4L) === ((2L, 0.5, 1.0, 0.0)))
    assert(got(5L) === ((1L, 1.0, 1.0, 0.0)))
  }
  private def round2(x: Double): Double = math.round(x * 10000).toDouble / 10000

  test("gopherGate: every rule trips on its hand case, signals match hand truth") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),                  // clean → kept
      (2L, "x # y # z #"),                             // symbol ratio 0.5 (+ alpha 0.5)
      (3L, "intro\n- a\n- b\n- c"),                    // bullet lines 3/4
      (4L, "wait for it...\nmore soon..."),            // ellipsis lines 2/2
      (5L, "a b"),                                     // too few words
      (6L, "one two three four"),                      // zero stop-word hits
      (7L, "the a b c d e f g h i j"),                 // 11 words > maxWords=10
      (8L, "the extraordinarily incomprehensible")     // mean word len 34/3 > 10
    ).toDF("doc_id", "text")
    val got = graft.ml.TextAnalysis.gopherGate(docs,
        minWords = 3, maxWords = 10, minMeanWlen = 1.0, maxMeanWlen = 10.0,
        maxSymbolRatio = 0.2, maxBulletFrac = 0.5, maxEllipsisFrac = 0.4,
        minAlphaFrac = 0.8, minStopHits = 1)
      .as[(Long, Long, Double, Double, Double, Double, Double, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9)))
      .toMap
    assert(got(1L) === ((6L, round2(17.0 / 6), 0.0, 0.0, 0.0, 1.0, 2L, true)))
    assert(got(2L) === ((6L, 1.0, 0.5, 0.0, 0.0, 0.5, 0L, false)))
    assert(got(3L) === ((7L, round2(11.0 / 7), 0.0, 0.75, 0.0, round2(4.0 / 7), 0L, false)))
    assert(got(4L) === ((5L, 4.6, 0.4, 0.0, 1.0, 1.0, 0L, false)))
    assert(got(5L) === ((2L, 1.0, 0.0, 0.0, 0.0, 1.0, 0L, false)))
    assert(got(6L) === ((4L, 3.75, 0.0, 0.0, 0.0, 1.0, 0L, false)))
    assert(got(7L) === ((11L, round2(13.0 / 11), 0.0, 0.0, 0.0, 1.0, 1L, false)))
    assert(got(8L) === ((3L, round2(34.0 / 3), 0.0, 0.0, 0.0, 1.0, 1L, false)))
  }

  test("native shingles_all_n: all positional grams, repeats kept, == scalar reference") {
    def ref(text: String, n: Int): Seq[String] = {
      val t = text.split(' ')
      (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" "))
    }
    val cases = Seq(
      "a b c d e",
      "a b c a b c a b c",       // repeats MUST survive (the ShinglesN difference)
      "a  b c", " a b c", "a b c   ",
      "a b", "a", "", "   ",
      "wörter über straße zwei")
    val got = cases.toDF("text")
      .select($"text",
        graft.functions.expressions.shingles_all_n($"text", 3).as("sh"))
      .as[(String, Seq[String])].collect().toMap
    for (c <- cases) assert(got(c) === ref(c, 3), s"all-grams diverge on '$c'")
    // element index == token position (posexplode contract for q119)
    assert(got("a b c a b c a b c")(3) === "a b c")
    // driver-side kernel == codegen path
    import org.apache.spark.unsafe.types.UTF8String
    val driver = graft.functions.NativeOps.shinglesAllN(UTF8String.fromString(cases(1)), 3)
    assert((0 until driver.numElements()).map(driver.getUTF8String(_).toString)
      === got(cases(1)))
  }

  test("duplicateSpans: canonical first kept, within-doc repeats, interval merge") {
    val docs = Seq(
      // doc 1 holds the corpus-first occurrence of "a b c" / "b c d" — no spans.
      (1L, "a b c d e f"),
      // cross-doc dup prefix (pos 0,1 → merged [0,3]) and a second
      // within-doc copy (pos 7,8 → merged [7,10]); gap 4..6 splits islands.
      (2L, "a b c d x y z a b c d"),
      // doc-internal repeat only: first occurrence canonical, second cut.
      (5L, "p q r s p q r s"),
      (9L, "solo words only here")
    ).toDF("doc_id", "text")
    val got = graft.ml.Dedup.duplicateSpans(docs, L = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (2L, 0L, 3L, 4L),
      (2L, 7L, 10L, 4L),
      (5L, 4L, 7L, 4L)))
  }

  test("tokenEntropy: hand truth incl. degenerate single-token distribution") {
    val docs = Seq(
      (1L, "a a a a"),    // H = 0, norm 0 (n_uniq = 1 guard)
      (2L, "a b a b"),    // H = ln 2, norm 1
      (3L, "a a b")       // H = ln 3 - (2 ln 2)/3
    ).toDF("doc_id", "text")
    val got = graft.ml.TextAnalysis.tokenEntropy(docs)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === ((4L, 1L, 0.0, 0.0)))
    assert(got(2L) === ((4L, 2L, round2(math.log(2)), 1.0)))
    val h3 = math.log(3) - 2 * math.log(2) / 3
    assert(got(3L) === ((3L, 2L, round2(h3), round2(h3 / math.log(2)))))
  }

  test("normalizedDupGroups: formatting variants collapse, real edits do not") {
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),
      (3L, "hello  world!!"),
      (4L, "hello worlds"),   // a real edit — never grouped
      (7L, "Numbers 42 stay")
    ).toDF("doc_id", "text")
    val got = graft.ml.Dedup.normalizedDupGroups(docs)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, 3L, false), (2L, 1L, 3L, true), (3L, 1L, 3L, true),
      (4L, 4L, 1L, false), (7L, 7L, 1L, false)))
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

  test("minhash+LSH pairs == exact all-pairs truth on sf0.01 (q31 oracle precondition)") {
    // q31's DuckDB oracle is the all-pairs J>=0.95 join over token-set
    // representatives — valid iff banding recall is EXHAUSTIVELY 1.0 on the
    // driver's correctness sf. Exact verification already pins precision
    // 1.0, so set equality == recall 1.0. If banding ever misses a pair
    // here, this fails BEFORE the driver's correctness gate does.
    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
    val got = Dedup.minhashPairs(docs, threshold = 0.95)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val reps = docs
      .select($"doc_id", array_sort(array_distinct(split($"text", " "))).as("ts"))
      .withColumn("setkey", xxhash64(concat_ws(" ", $"ts")))
      .groupBy("setkey").agg(min("doc_id").as("rep"), first("ts").as("ts"))
    val l = reps.select($"rep".as("a"), $"ts".as("ts_a"))
    val r = reps.select($"rep".as("b"), $"ts".as("ts_b"))
    val truth = l.join(r, $"a" < $"b")
      .withColumn("j", round(Dedup.jaccard($"ts_a", $"ts_b"), 4))
      .filter($"j" >= 0.95)
      .select($"a", $"b", $"j").as[(Long, Long, Double)].collect().toSet
    assert(truth.nonEmpty, "fixture must exercise the operator")
    assert(got === truth,
      s"banding recall < 1.0 on sf0.01 (got ${got.size}, truth ${truth.size}) — q31 oracle invalid")
  }

  test("minhashMatchesAgainst: exact cross-dup caught, eval-doc counting, member expansion") {
    val shared = (1 to 20).map(i => s"t$i")
    val docs = Seq(
      (100L, shared.mkString(" ")),            // eval
      (101L, shared.mkString(" ")),            // eval, identical set to 100
      (102L, "x y z"),                         // eval, disjoint vocabulary
      (1L, shared.mkString(" ")),              // corpus: EXACT eval dup (J=1.0)
      (5L, shared.reverse.mkString(" ")),      // corpus: same SET as 1 (order differs)
      (2L, shared.take(19).mkString(" ")),     // corpus: J=19/20=0.95, at threshold
      (3L, shared.take(10).mkString(" ")),     // corpus: J=0.5, below
      (4L, "z y x"))                           // corpus: exact dup of eval 102
      .toDF("doc_id", "text")
    val got = Dedup.minhashMatchesAgainst(docs, col("doc_id") >= 100L, threshold = 0.95)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // identical-set cross pairs survive the per-side collapse (the self-join
    // collapse would swallow them); eval matches count eval DOCS (100+101).
    assert(got === Map(
      1L -> ((2L, 1.0)), 5L -> ((2L, 1.0)),
      2L -> ((2L, 0.95)),
      4L -> ((1L, 1.0))))
  }

  test("minhashMatchesAgainst == cross all-pairs truth on sf0.01 (q117 oracle precondition)") {
    // Same argument as the q31 test: exact verification pins precision 1.0,
    // so set equality == banding recall 1.0 on the driver's correctness sf —
    // which is what licenses q117's all-pairs DuckDB oracle.
    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
    val pred = col("doc_id") % 25 === 0
    val got = Dedup.minhashMatchesAgainst(docs, pred, threshold = 0.95)
      .as[(Long, Long, Double)].collect().toSet
    val toks = docs.select($"doc_id", pred.as("is_e"),
      array_sort(array_distinct(split($"text", " "))).as("ts"))
    val truth = toks.filter(!$"is_e").select($"doc_id", $"ts".as("ts_c"))
      .crossJoin(toks.filter($"is_e").select($"ts".as("ts_e")))
      .withColumn("j", round(Dedup.jaccard($"ts_c", $"ts_e"), 4))
      .filter($"j" >= 0.95)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max($"j").as("mj"))
      .as[(Long, Long, Double)].collect().toSet
    assert(truth.nonEmpty, "fixture must exercise the operator")
    assert(got === truth,
      s"cross banding recall < 1.0 on sf0.01 (got ${got.size}, truth ${truth.size}) — q117 oracle invalid")
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

  /** Deterministic clustered vectors: `nClusters` integer-lattice centers,
    * members = center + tiny per-dimension perturbation. Within-cluster
    * cosine ≈ 1, cross-cluster ≈ random — the regime LSH banding must win
    * in, so a broken banding actually fails this floor (unlike the noisy
    * uniform-random fixture above, kept as the subset/no-dupes check). */
  private def clusteredVecs(n: Int, nClusters: Int, dim: Int) = {
    (1L to n.toLong).map { i =>
      val c = (i % nClusters).toInt
      val emb = Seq.tabulate(dim) { d =>
        val center = (((c * 131 + d * 17) % 19) - 9).toFloat
        val jitter = (((i * 37 + d * 7) % 5) - 2).toFloat * 0.02f
        center + jitter
      }
      (i, emb)
    }.toDF("vec_id", "embedding")
  }

  test("knn LSH: high recall on a clustered corpus (regression floor 0.8)") {
    val e = clusteredVecs(300, 12, 64)
    val q = e.filter($"vec_id" % 25 === 0)
    val brute = Similarity.knnBruteForce(q, e, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.knnLsh(spark, q, e, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(brute.union(approx))) // sanity
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.8, s"clustered ANN recall $recall — banding regressed")
  }

  test("knn IVF: high recall on a clustered corpus, bucketed equi-join only") {
    val e = clusteredVecs(300, 12, 64)
    val q = e.filter($"vec_id" % 25 === 0)
    val brute = Similarity.knnBruteForce(q, e, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.knnIvf(spark, q, e, 5, nCells = 12, nProbe = 3)
    val got = ivf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall — quantizer or probing regressed")
    // candidate generation is an equi-join on cell, never a nested loop
    val plan = ivf.queryExecution.executedPlan
    val bad = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, "IVF candidate join is not an equi-join")
    // each (query, neighbor) arises at most once (one cell per candidate)
    val dupes = Similarity.knnIvf(spark, q, e, 5, nCells = 12, nProbe = 3)
      .groupBy("query_id", "neighbor_id").count().filter($"count" > 1).count()
    assert(dupes === 0L)
  }

  test("IVF model persistence: saved model == trained model, probe output identical") {
    val e = clusteredVecs(300, 12, 64)
    val q = e.filter($"vec_id" % 25 === 0)
    val path = s"${graft.core.Constants.workDir}/models/ivf_mlspec"
    val trained = Similarity.saveIvfModel(spark, e, path, nCells = 12, iters = 2)
    val loaded = Similarity.loadIvfModel(spark, path)
    // exact float roundtrip through the parquet model table
    assert(loaded.length === trained.length)
    for ((l, t) <- loaded.zip(trained)) assert(l.toSeq === t.toSeq)
    // probe-many with the loaded model == probing with the in-memory one
    val a = Similarity.knnIvfModel(spark, q, e, 5, trained, nProbe = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val b = Similarity.knnIvfModel(spark, q, e, 5, loaded, nProbe = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a === b)
    // and the persisted-model path keeps the clustered-corpus recall floor
    val brute = Similarity.knnBruteForce(q, e, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = b.map { case (x, y, _) => (x, y) }
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.8, s"persisted-model IVF recall $recall")
  }

  test("PQ ANN: full refine == brute force exactly; codes are m small ints") {
    val e = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val q = e.filter($"vec_id" % 50 === 0)
    val books = Similarity.trainPqCodebooks(e, m = 8, ks = 16, iters = 2)
    // with refine >= |candidates| the ADC shortlist is everything, so the
    // exact re-rank IS the brute-force ranking — output identity, not a
    // recall floor
    val full = Similarity.knnPqModel(spark, q, e, 5, books,
      refine = e.count().toInt)
      .select("query_id", "neighbor_id", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect().toSet
    val brute = Similarity.knnBruteForce(q, e, 5)
      .select("query_id", "neighbor_id", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(full === brute)
    // the compressed representation: one code per sub-space, all in [0, ks)
    val codes = Similarity.pqEncode(e, books).select("codes")
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("PQ ANN: high recall on a clustered corpus; persisted model parity") {
    val e = clusteredVecs(300, 12, 64)
    val q = e.filter($"vec_id" % 25 === 0)
    val brute = Similarity.knnBruteForce(q, e, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val path = s"${graft.core.Constants.workDir}/models/pq_mlspec"
    val trained = Similarity.savePqModel(spark, e, path, m = 8, ks = 16, iters = 2)
    val loaded = Similarity.loadPqModel(spark, path)
    // exact float roundtrip through the parquet model table
    assert(loaded.length === trained.length)
    for ((ls, ts) <- loaded.zip(trained); (l, t) <- ls.zip(ts))
      assert(l.toSeq === t.toSeq)
    val got = Similarity.knnPqModel(spark, q, e, 5, loaded, refine = 40)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.8, s"PQ recall $recall — codebooks or ADC regressed")
    // loaded-model probe == in-memory-model probe, rank for rank
    val a = Similarity.knnPqModel(spark, q, e, 5, trained, refine = 40)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val b = Similarity.knnPqModel(spark, q, e, 5, loaded, refine = 40)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a === b)
  }

  test("tiled cosine near-dup pairs == brute-force truth (exact completeness)") {
    val e = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val got = Similarity.cosineNearDupPairs(e, 0.35, blocks = 8)
      .select("a", "b", "cos").as[(Long, Long, Double)].collect().toSet
    val l = e.select($"vec_id".as("a"), $"embedding".as("e_a"))
    val r = e.select($"vec_id".as("b"), $"embedding".as("e_b"))
    val truth = l.join(r, $"a" < $"b") // deliberate nested-loop: the test oracle
      .withColumn("cos", cosine_sim($"e_a", $"e_b"))
      .filter($"cos" >= 0.35)
      .select($"a", $"b", round($"cos", 4).as("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got === truth)
  }

  test("embeddingOutliers: planted outlier flagged, cluster members pass, every row present") {
    // Group 0 clusters around +x; vec 99 points the opposite way.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.05f), 0), (2L, Seq(0.95f, 0.1f), 0),
      (3L, Seq(1.0f, 0.0f), 0), (99L, Seq(-1.0f, 0.0f), 0),
      (10L, Seq(0.0f, 1.0f), 1), (11L, Seq(0.05f, 0.98f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.ml.Similarity.embeddingOutliers(vecs, "label", threshold = 0.5)
      .as[(Long, Int, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 99L, 10L, 11L))
    assert(got(99L)._4, "planted opposite-direction vector not flagged")
    for (id <- Seq(1L, 2L, 3L, 10L, 11L))
      assert(!got(id)._4, s"cluster member $id misflagged (cos ${got(id)._3})")
    // flag is exactly the reported-cosine threshold rule (self-consistency)
    assert(got.values.forall(r => r._4 === (r._3 < 0.5)))
  }

  test("semDedup: one-cell groups == exact pair components; keeper = min-(cent_cos, id)") {
    val e = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val got = Similarity.semDedup(spark, e, threshold = 0.35, nCells = 1)
      .as[(Long, Int, Long, Double, Boolean)].collect()
    assert(got.nonEmpty, "fixture has no near-dup embedding pairs at 0.35")
    // with ONE cell nothing is forfeited: duplicate groups must equal the
    // components of the exact tiled pair relation.
    val truth = graft.ml.Corpus.connectedComponents(
      Similarity.cosineNearDupPairs(e, 0.35).select($"a", $"b"))
      .select("doc_id", "rep").as[(Long, Long)].collect().toMap
    assert(got.map(r => r._1 -> r._3).toMap === truth)
    // exactly one keeper per group — the member minimizing (cent_cos, id),
    // i.e. the paper's least-centroid-similar representative.
    for ((rep, ms) <- got.groupBy(_._3)) {
      assert(ms.count(_._5) === 1, s"rep $rep keeper count != 1")
      assert(ms.find(_._5).get._1 === ms.minBy(m => (m._4, m._1))._1,
        s"rep $rep keeper is not the min-(cent_cos, id) member")
    }
  }

  test("semDedup: cells only FORFEIT pairs — a k=4 duplicate group never spans k=1 components") {
    val e = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val oneRep = Similarity.semDedup(spark, e, 0.35, nCells = 1)
      .select("vec_id", "rep").as[(Long, Long)].collect().toMap
    val four = Similarity.semDedup(spark, e, 0.35, nCells = 4)
      .select("vec_id", "rep").as[(Long, Long)].collect()
    for ((_, grp) <- four.groupBy(_._2)) {
      assert(grp.map(m => oneRep(m._1)).toSet.size === 1,
        "a k=4 duplicate group split across k=1 components")
    }
  }

  test("prefix+length-filtered ngram jaccard == unfiltered inverted-index truth") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val got = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // truth: naive all-pairs over shingle arrays (no pruning at all)
    val sh = docs.select($"doc_id", $"lang", Dedup.shingles3($"text").as("sh"))
    val l = sh.select($"lang".as("lang_a"), $"doc_id".as("a"), $"sh".as("sh_a"))
    val r = sh.select($"lang".as("lang_b"), $"doc_id".as("b"), $"sh".as("sh_b"))
    val truth = l.join(r, $"lang_a" === $"lang_b" && $"a" < $"b")
      .withColumn("jaccard", round(Dedup.jaccard($"sh_a", $"sh_b"), 4))
      .filter($"jaccard" >= 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got === truth)
  }

  test("prefix-pruned containment pairs == unpruned all-pairs truth") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val got = Dedup.containmentPairs(docs, threshold = 0.8)
      .select("a", "b", "containment").as[(Long, Long, Double)].collect().toSet
    val sh = docs.select($"doc_id", $"lang", Dedup.shingles3($"text").as("sh"))
    val l = sh.select($"lang".as("lang_a"), $"doc_id".as("a"), $"sh".as("sh_a"))
    val r = sh.select($"lang".as("lang_b"), $"doc_id".as("b"), $"sh".as("sh_b"))
    val truth = l.join(r, $"lang_a" === $"lang_b" && $"a" =!= $"b" && size($"sh_a") > 0)
      .withColumn("containment",
        round(size(array_intersect($"sh_a", $"sh_b")).cast("double") / size($"sh_a"), 4))
      .filter($"containment" >= 0.8)
      .select("a", "b", "containment").as[(Long, Long, Double)].collect().toSet
    assert(got === truth)
    assert(got.nonEmpty, "fixture alias rows should produce containment pairs")
  }

  test("containment catches subsets that symmetric Jaccard misses") {
    // doc 2 is a verbatim excerpt of doc 1: containment(2 ⊂ 1) = 1.0 while
    // jaccard is far below any dedup threshold — the syndication case.
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (10 to 21).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, "en", long), (2L, "en", excerpt), (3L, "en", "unrelated text entirely"))
      .toDF("doc_id", "lang", "text")
    val cont = Dedup.containmentPairs(docs, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(cont === Set((2L, 1L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(docs, threshold = 0.5).count()
    assert(jac === 0L, "jaccard should NOT fire on the excerpt pair")
  }

  test("top-k aggregate knn == window-ranked reference (order + ties)") {
    val e = clusteredVecs(200, 8, 16)
    val q = e.filter($"vec_id" % 20 === 0)
    val got = Similarity.knnBruteForce(q, e, 5)
      .select("query_id", "neighbor_id", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect().toSet
    val qq = q.select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy(desc("cos"), asc("neighbor_id"))
    val ref = c.join(broadcast(qq), $"query_id" =!= $"neighbor_id")
      .withColumn("cos", cosine_sim($"q_emb", $"c_emb"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"neighbor_id", $"rank", round($"cos", 4).as("cos"))
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got === ref)
  }

  test("multimodal decode: real codecs read dims/duration/frames from payload bytes") {
    val media = graft.core.Fixtures.table(spark, TestSpark.Sf0001, "media")
    val feats = Multimodal.decodeFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.decode_ok), "every fixture payload decodes")
    // metadata ↔ payload agreement: the DECODED header dims equal the
    // fixture's metadata columns (nothing is copied — the decoder reads
    // the bytes the encoder wrote).
    val meta = media.select("doc_id", "width", "height")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    for (f <- rows if f.kind != "audio")
      assert((f.decoded_w, f.decoded_h) === meta(f.doc_id), s"dims for ${f.doc_id}")
    for (f <- rows) f.kind match {
      case "image" =>
        assert(f.thumb_w <= 32 && f.thumb_h <= 32 && f.thumb_w > 0)
        assert(f.mean_signal > 0.0 && f.n_frames == 0 && f.duration_sec == 0.0)
      case "audio" =>
        val n = 400 + f.doc_id % 256
        assert(f.duration_sec === math.rint(n / 8000.0 * 10000) / 10000)
        assert(f.mean_signal > 0.0 && f.decoded_w == 0)
      case _ =>
        val exp = (2 + f.doc_id % 3).toInt
        assert(f.n_frames === exp)
        assert(f.n_frames_sampled === (exp + 1) / 2) // stride-2 sampler
        assert(f.mean_signal > 0.0)
    }
    // determinism across runs
    val again = Multimodal.decodeFeatures(spark, media).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("media codecs: hand-computed truths and corrupt-payload degradation") {
    import graft.core.MediaCodecs
    // BMP 2×2 with known pixels: luma (299r+587g+114b)/1000 per pixel.
    val bmp = MediaCodecs.encodeBmp(2, 2, {
      case (0, 0) => (255, 0, 0) // luma 76
      case (1, 0) => (0, 255, 0) // luma 149
      case (0, 1) => (0, 0, 255) // luma 29
      case _      => (255, 255, 255) // luma 255
    })
    assert(bmp.length === MediaCodecs.bmpSize(2, 2))
    val bi = MediaCodecs.decodeBmp(bmp).get
    assert(bi.width === 2 && bi.height === 2)
    assert(bi.meanLuma === (76 + 149 + 29 + 255) / 4.0)
    assert((bi.thumbW, bi.thumbH) === (2, 2)) // already inside the box
    assert(bi.thumbMeanLuma === bi.meanLuma)
    // WAV: two samples ±1000 → RMS exactly 1000.
    val wav = MediaCodecs.encodeWavPcm16(8000, Array[Short](1000, -1000))
    assert(wav.length === MediaCodecs.wavSize(2))
    val wi = MediaCodecs.decodeWav(wav).get
    assert(wi.sampleRate === 8000 && wi.nSamples === 2 && wi.rms === 1000.0)
    // Y4M: 2 frames of 1×2 mono, lumas (10,20) and (30,40); stride 2
    // samples only frame 0 → mean 15.
    val y4m = MediaCodecs.encodeY4m(1, 2, 2, (f, _, y) => 10 * (1 + 2 * f + y))
    assert(y4m.length === MediaCodecs.y4mSize(1, 2, 2))
    val vi = MediaCodecs.decodeY4m(y4m, stride = 2).get
    assert(vi.width === 1 && vi.height === 2 && vi.nFrames === 2)
    assert(vi.nSampled === 1 && vi.sampledMeanLuma === 15.0)
    // corruption degrades to None, never throws
    assert(MediaCodecs.decodeBmp("junk".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav(bmp).isEmpty)
    assert(MediaCodecs.decodeY4m(wav).isEmpty)
    assert(MediaCodecs.decodeBmp(bmp.take(40)).isEmpty)
    assert(MediaCodecs.decodeWav(wav.take(43)).isEmpty)
    assert(MediaCodecs.decodeY4m(y4m.take(y4m.length - 1)).isEmpty)
  }

  /** Scalar reference for winnowing: k-grams, min per w-window, dedup. */
  private def winnowRef(text: String, k: Int, w: Int): Set[String] = {
    val tk = text.split(" ", -1)
    val grams = tk.sliding(k).filter(_.length == k).map(_.mkString(" ")).toVector
    if (grams.isEmpty) Set.empty
    else if (grams.length < w) Set(grams.min)
    else grams.sliding(w).map(_.min).toSet
  }

  test("winnowFingerprints == scalar reference; short docs winnow to one window") {
    val docs = Seq(
      (1L, "e d c b a e d c b a"), // 8 grams, repeated minima
      (2L, "a b c"),               // exactly one gram (< w → single window)
      (3L, "z y x w v"),           // 3 grams < w=4 → min of all
      (4L, "a b"))                 // < k tokens → no grams, no rows
      .toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, k = 3, w = 4)
      .as[(Long, String)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val want = Seq(
      1L -> "e d c b a e d c b a",
      2L -> "a b c",
      3L -> "z y x w v")
      .map { case (id, t) => id -> winnowRef(t, 3, 4) }.toMap
    assert(got === want)
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // Seeded random docs over a tiny vocabulary (maximal repetition
    // stress), each pair sharing an injected verbatim run of exactly
    // w+k-1 = 6 tokens — the minimal length the guarantee covers.
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def salad(n: Int) = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val docs = (0 until 20).map { i =>
      val run = salad(6).mkString(" ")
      val a = (salad(15) :+ run).mkString(" ") + " " + salad(9).mkString(" ")
      val b = salad(4).mkString(" ") + " " + run + " " + salad(21).mkString(" ")
      (i, a, b)
    }
    val rows = docs.flatMap { case (i, a, b) =>
      Seq((i * 2L, a), (i * 2L + 1L, b)) }.toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(rows, k = 3, w = 4)
      .as[(Long, String)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    for ((i, a, b) <- docs) {
      val shared = fps(i * 2L) intersect fps(i * 2L + 1L)
      assert(shared.nonEmpty, s"pair $i shares no fingerprint:\n$a\n$b")
      // and the engine agrees with the scalar reference on both docs
      assert(fps(i * 2L) === winnowRef(a, 3, 4))
      assert(fps(i * 2L + 1L) === winnowRef(b, 3, 4))
    }
  }

  test("native winnow_fps: codegen == driver kernel == scalar ref on edge shapes") {
    import graft.functions.NativeOps
    import org.apache.spark.unsafe.types.UTF8String
    // Spark-split grain (trailing/consecutive empties kept), duplicate
    // minima, sub-window docs, multi-byte UTF-8 ordering.
    val cases = Seq(
      "e d c b a e d c b a",
      "a  b c ",            // empty tokens: consecutive + trailing space
      "a b c",              // single gram
      "a b",                // < k tokens → empty
      "",                   // 1 empty token → empty at k=3
      "z y x w v u t s r q p o n m",
      "é z a 的 b ß c d")   // multi-byte: binary order, not collation
    for (c <- cases; (k, w) <- Seq((3, 4), (1, 2), (2, 1))) {
      val want = // scalar reference at (k, w), Spark-split token grain
        { val tk = c.split(" ", -1)
          val grams = tk.sliding(k).filter(_.length == k).map(_.mkString(" ")).toVector
          if (grams.isEmpty) Vector.empty
          else if (grams.length < w) Vector(grams.min)
          else grams.sliding(w).map(_.min).toVector }
      val drv = NativeOps.winnowN(UTF8String.fromString(c), k, w)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toVector
      assert(drv === want.distinct, s"driver kernel, '$c' k=$k w=$w")
      val cg = Seq(c).toDF("text")
        .select(graft.functions.expressions.winnow_fps($"text", k, w))
        .as[Seq[String]].head().toVector
      assert(cg === want.distinct, s"codegen path, '$c' k=$k w=$w")
    }
  }

  test("thresholdSweep: monotone curve, hand truth, zero-pair thresholds survive") {
    // Identical docs (J=1.0), a 5-shared / 7-union pair (J=0.7143), and
    // an unrelated doc.
    val docs = Seq(
      (1L, "a b c d e f g"),     // shingles {abc,bcd,cde,def,efg} (5)
      (2L, "a b c d e f g"),     // identical → J(1,2)=1.0
      (3L, "a b c d e f x"),     // {abc,bcd,cde,def,efx}: ∩=4, ∪=6 → 0.6667
      (4L, "p q r s t u v"))     // unrelated
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = Dedup.thresholdSweep(docs, Seq(0.5, 0.7, 0.9, 0.99))
      .as[(Double, Long, Long)].collect().sortBy(_._1)
    // t=0.5: pairs (1,2) 1.0, (1,3) .6667, (2,3) .6667 → 3 pairs, 3 docs
    // t=0.7: only (1,2) → 1 pair, 2 docs; t=0.9 same; t=0.99 same (J=1.0)
    assert(got === Array(
      (0.5, 3L, 3L), (0.7, 1L, 2L), (0.9, 1L, 2L), (0.99, 1L, 2L)))
    // a sweep past every pair keeps the zero rows
    val hi = Dedup.thresholdSweep(docs.filter(col("doc_id") =!= 2), Seq(0.9, 0.99))
      .as[(Double, Long, Long)].collect().sortBy(_._1)
    assert(hi === Array((0.9, 0L, 0L), (0.99, 0L, 0L)))
  }

  // ---- round 5 (sixth session): SpotSigs ----

  test("spotSigFrame: chain construction — tail antecedent, adjacent antecedents, dedup") {
    val docs = Seq(
      // 'the' -> next 2 non-antecedent tokens skip 'of'; 'of' chains too;
      // trailing 'a' yields an EMPTY chain -> dropped by the '%:' guard
      (1L, "the cat of mat sat a"),
      // no antecedents at all -> empty signature set
      (2L, "cats mats bats"),
      // duplicated spot signature appears once (array_distinct)
      (3L, "the dog barks the dog barks"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = Dedup.spotSigFrame(docs)
      .as[(Long, String, Seq[String], Int)].collect()
      .map(r => r._1 -> ((r._3.toSet, r._4))).toMap
    assert(got(1L) === ((Set("the:cat mat", "of:mat sat"), 2)))
    assert(got(2L) === ((Set.empty[String], 0)))
    assert(got(3L) === ((Set("the:dog barks"), 1)))
  }

  test("dedupAgreement: hand truth — subset, disjoint, and empty-intersection methods") {
    val m1 = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b") // superset
    val m2 = Seq((2L, 1L), (3L, 4L)).toDF("a", "b")           // ⊂ m1, one reversed
    val m3 = Seq((7L, 8L)).toDF("a", "b")                     // disjoint
    val got = graft.ml.Dedup.dedupAgreement(Map("x1" -> m1, "x2" -> m2, "x3" -> m3))
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("x1", "x2")) === (("x1", "x2", 3L, 2L, 2L, r6(2.0 / 3))))
    assert(got(("x1", "x3")) === (("x1", "x3", 3L, 1L, 0L, 0.0)))
    assert(got(("x2", "x3")) === (("x2", "x3", 2L, 1L, 0L, 0.0)))
  }

  test("spotSigPairs == all-pairs truth; boilerplate noise cannot break the match") {
    // 1 and 2 share the natural-language spans but 2 carries a stopword-
    // POOR boilerplate tail — SpotSigs ignores it (the paper's point);
    // 3 is unrelated prose with the same antecedents
    val docs = Seq(
      (1L, "the market rallied and traders cheered with gains of two percent today"),
      (2L, "the market rallied and traders cheered with gains of two percent today " +
        "click here subscribe newsletter cookie settings privacy terms"),
      (3L, "the weather cooled and farmers worried with storms of late spring rain"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    def spots(t: String): Set[String] = {
      val ants = Dedup.SpotAntecedents.toSet
      val tk = t.split(" ")
      tk.indices.collect { case i if ants(tk(i)) =>
        val chain = tk.drop(i + 1).filterNot(ants).take(2).mkString(" ")
        s"${tk(i)}:$chain"
      }.filterNot(_.endsWith(":")).toSet
    }
    val m = docs.as[(Long, String, String)].collect().map(r => r._1 -> spots(r._2)).toMap
    def jac(a: Long, b: Long) = {
      val j = m(a).intersect(m(b)).size.toDouble / m(a).union(m(b)).size
      math.round(j * 10000).toDouble / 10000
    }
    val truth = (for {
      a <- m.keys; b <- m.keys if a < b
      j = jac(a, b) if j >= 0.5
    } yield (a, b, j)).toSet
    val got = Dedup.spotSigPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === truth)
    // and the pair (1,2) in particular survives the boilerplate tail
    assert(got.exists(p => p._1 == 1L && p._2 == 2L), s"got $got")
  }
}
