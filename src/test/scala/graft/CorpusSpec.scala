package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Corpus

/** Corpus-level pipeline operators: connected-components clustering vs a
  * union-find truth, decontamination vs hand-built overlap, deterministic
  * stratified sampling, top-k token stats vs a naive computation. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connectedComponents == union-find truth on seeded random graphs") {
    // Three densities: sparse (many tiny components), balanced, dense (one
    // giant component) — the regimes a dedup pair graph actually spans.
    for ((seed, n, m) <- Seq((42, 80, 70), (7, 60, 20), (13, 40, 120))) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // Union-find truth; union-by-min keeps each root = component minimum.
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val truthRep = nodes.map(v => v -> find(v.toInt).toLong).toMap
      val truthSize = truthRep.values.groupBy(identity).map { case (r, vs) => r -> vs.size.toLong }

      val got = Corpus.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long, Long)].collect()
      assert(got.length === nodes.size, s"seed=$seed node count")
      for ((id, rep, sz) <- got) {
        assert(rep === truthRep(id), s"seed=$seed rep of $id")
        assert(sz === truthSize(truthRep(id)), s"seed=$seed cluster_size of $id")
      }
    }
  }

  test("connectedComponents merges a 40-node chain in O(log) rounds") {
    // Worst-case diameter: hook alone needs ~40 rounds; with path
    // compression the reachable distance grows ~2^k, so 12 rounds suffice.
    val chain = (0L until 40L).sliding(2).map(s => (s.head, s.last)).toSeq
    val got = Corpus.connectedComponents(chain.toDF("a", "b"), maxIter = 12)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 40)
    assert(got.forall(_._2 == 0L), "all chain nodes collapse to rep 0")
    assert(got.forall(_._3 == 40L))
  }

  test("connectedComponents: storage-backed checkpoint mode == localCheckpoint mode") {
    // The cluster deployment shape: per-round label tables commit to a
    // reliable path (executor loss replays from the last committed round)
    // instead of memory-backed localCheckpoint. Same labels, and superseded
    // round dirs are released as the loop advances.
    val rnd = new scala.util.Random(4242)
    val edges = Seq.fill(90)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
      .filter { case (a, b) => a != b }.distinct
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val viaStorage = Corpus.connectedComponents(edges.toDF("a", "b"),
      checkpointDir = Some(ckpt))
      .as[(Long, Long, Long)].collect().toSet
    val viaLocal = Corpus.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaStorage === viaLocal)
    // Only the final round's label table remains (sym + superseded rounds
    // deleted); the returned frame stays readable from it.
    import scala.jdk.CollectionConverters._
    val left = scala.util.Using.resource(java.nio.file.Files.list(java.nio.file.Paths.get(ckpt)))(
      _.iterator().asScala.map(_.getFileName.toString).toSeq)
    assert(left.count(_.startsWith("labels_r")) === 1, s"round dirs leaked: $left")
    assert(!left.contains("sym"), s"sym edge table not released: $left")
  }

  test("connectedComponents output is invariant to the input partitioning") {
    // The north-rule determinism story: the labels are a pure function of
    // the edge SET, so physical layout must not matter.
    val rnd = new scala.util.Random(99)
    val edges = Seq.fill(60)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }.distinct
    val a = Corpus.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long, Long)].collect().toSet
    val b = Corpus.connectedComponents(edges.toDF("a", "b").repartition(7, col("b")))
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("curate plan: composed gates stay equi/semi/anti joins — no nested loop") {
    val docs = Seq((1L, "en", "s", (1 to 35).map("w" + _).mkString(" ")))
      .toDF("doc_id", "lang", "source", "text")
    val plan = Corpus.curate(docs, col("doc_id") % 37 === 0)
      .queryExecution.executedPlan
    val bad = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"curate composition planned a non-equi join:\n$plan")
  }

  test("connectedComponents frees superseded per-round checkpoints") {
    // Each round localCheckpoints a new label table; superseded copies (and
    // the edge table) must be unpersisted, or a long-running pipeline
    // accumulates one corpus-sized cached replica per round. The chain
    // needs ~6 rounds — without freeing, the persistent-RDD delta would be
    // ~7+; with it, only the final label table may remain.
    val before = spark.sparkContext.getPersistentRDDs.size
    val chain = (0L until 40L).sliding(2).map(s => (s.head, s.last)).toSeq
    val out = Corpus.connectedComponents(chain.toDF("a", "b"), maxIter = 12)
    assert(out.count() === 40)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 2,
      s"checkpoint storage leaked: $before persistent RDDs before, $after after")
  }

  test("decontaminate finds exactly the docs sharing a 3-gram with the eval slice") {
    // Eval slice = doc_id % 37 == 0 → docs 0 and 37.
    // shingles(0) = {a b c, b c d}; shingles(37) = {x y z}.
    val df = Seq(
      (0L, "a b c d"), (37L, "x y z"),
      (1L, "a b c q"),           // shares "a b c"            → overlap 1
      (2L, "q w e r"),           // shares nothing
      (3L, "b c d x y z w"))     // shares "b c d" + "x y z"  → overlap 2
      .toDF("doc_id", "text")
    val got = Corpus.decontaminate(df, col("doc_id") % 37 === 0)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 3L -> 2L))
  }

  test("8-gram decontaminate fires only on long verbatim overlap (precision of wide n)") {
    // Docs 1 and 2 share a 3-gram phrase with the eval doc; only doc 1
    // shares 8 consecutive tokens. Wide-n decontamination must flag doc 1
    // alone — the precision long n-grams buy over the 3-gram grain.
    val evalText = (1 to 12).map("e" + _).mkString(" ")
    val df = Seq(
      (0L, evalText),                                                // eval (0 % 5 == 0)
      (1L, "x " + (1 to 9).map("e" + _).mkString(" ") + " y"),       // 8+ verbatim tokens
      (2L, "e1 e2 e3 " + (1 to 8).map("q" + _).mkString(" ")),       // only a 3-gram
      (3L, (1 to 11).map("z" + _).mkString(" ")))                    // nothing shared
      .toDF("doc_id", "text")
    val wide = Corpus.decontaminate(df, col("doc_id") % 5 === 0, n = 8)
      .as[(Long, Long)].collect().toMap
    assert(wide === Map(1L -> 2L), s"8-gram: $wide") // e1..e8, e2..e9
    val narrow = Corpus.decontaminate(df, col("doc_id") % 5 === 0, n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(narrow === Set(1L, 2L), "3-gram grain flags the common phrase too")
  }

  test("stratifiedSample is deterministic, key-stable and near the target rate") {
    val df = (0L until 5000L).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 3 === 0, "en").otherwise("de"))
      .withColumn("source", lit("s"))
    val expected = (0L until 5000L).filter(id => (id * 48271L + 11L) % 1000L < 200L)
    val got = Corpus.stratifiedSample(df, permille = 200)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === expected, "sample == the pure function of the key")
    // Key-stability: a different physical partitioning yields the same set.
    val got2 = Corpus.stratifiedSample(df.repartition(7, col("lang")), permille = 200)
      .select("doc_id").as[Long].collect().sorted
    assert(got2.toSeq === expected)
    // Rate is near 200‰ (the LCG is a permutation mod 1000 → near-exact).
    assert(math.abs(got.length / 5000.0 - 0.2) < 0.01)
  }

  test("sampleBucket is sign-safe: negative keys land in [0, 1000) and sample correctly") {
    // A production key swap (xxhash64(key, salt) is SIGNED) must not flip
    // the bucket negative — signed % would make every negative key compare
    // < permille and silently over-sample. pmod pins bucket ∈ [0, 1000).
    val df = (-2500L until 2500L).toDF("doc_id")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    def floorMod(x: Long): Long = java.lang.Math.floorMod(x * 48271L + 11L, 1000L)
    val buckets = df.select(col("doc_id"), Corpus.sampleBucket(col("doc_id")).as("b"))
      .as[(Long, Int)].collect()
    assert(buckets.forall { case (_, b) => b >= 0 && b < 1000 })
    for ((id, b) <- buckets) assert(b.toLong === floorMod(id), s"bucket of $id")
    val got = Corpus.stratifiedSample(df, permille = 200)
      .select("doc_id").as[Long].collect().sorted
    val expected = (-2500L until 2500L).filter(id => floorMod(id) < 200L)
    assert(got.toSeq === expected)
    // ~200‰ on the negative half too — the over-sampling signed % caused.
    val negRate = got.count(_ < 0) / 2500.0
    assert(math.abs(negRate - 0.2) < 0.02, s"negative-key sample rate $negRate")
  }

  test("decontaminate plan: equi-join only, no forced broadcast of either side") {
    // Both sides of the shingle join are corpus-scale-sensitive (the eval
    // side is usually small, but that is AQE's measured-size call, not a
    // baked hint). With auto-broadcast disabled and AQE off, any surviving
    // BroadcastHashJoin could only come from an explicit hint — pin none.
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (0L until 200L).map(i => (i, s"w${i % 9} w${(i + 1) % 9} w${(i + 2) % 9} w${i % 5}"))
        .toDF("doc_id", "text")
      val plan = Corpus.decontaminate(df, col("doc_id") % 37 === 0)
        .queryExecution.executedPlan
      val bad = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bad.isEmpty, s"decontaminate plan has a forced/non-equi join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("topTokens plan: map-side partial agg before the shuffle + group-limit pushdown") {
    val df = Seq(("en", "a b c a"), ("de", "x y")).toDF("lang", "text")
    val s = Corpus.topTokens(df, 3).queryExecution.executedPlan.toString
    assert(s.contains("partial_count"),
      "token stream must be collapsed map-side before the (lang, token) shuffle")
    assert(s.contains("WindowGroupLimit"),
      "per-lang top-k must push a group limit below the window exchange")
  }

  test("curate == the intersection of its five gates computed independently") {
    // Synthetic corpus with every gate exercised: an eval doc, a contaminated
    // doc, a near-dup pair (loser dropped, keeper kept), a too-short doc,
    // and docs falling in/out of the deterministic sample.
    // Sample buckets ((id·48271+11) % 1000 < 500): 1→282✓ 2→553✗ 5→366✓
    // 8→179✓ 9→450✓ — ids chosen so the sample gate is NOT what kills the
    // contaminated/short/loser docs.
    val base = (1 to 30).map("w" + _).mkString(" ")
    val docs = Seq(
      (0L, "en", "s", (1 to 30).map("e" + _).mkString(" ")),     // eval (0 % 37 == 0)
      (1L, "en", "s", "e1 e2 e3 " + (1 to 27).map("q" + _).mkString(" ")), // contaminated
      (2L, "en", "s", "a b c"),                                  // too short
      (5L, "en", "s", base),                                     // keeper of {5, 9}
      (9L, "en", "s", base + " w31"),                            // near-dup loser of 5
      (8L, "en", "s", (1 to 35).map("u" + _).mkString(" "))      // independent survivor
    ).toDF("doc_id", "lang", "source", "text")
    val evalPred = col("doc_id") % 37 === 0
    val got = Corpus.curate(docs, evalPred, minTokens = 30, permille = 500)
      .select("doc_id").as[Long].collect().toSet

    val notEval = Set(1L, 2L, 5L, 8L, 9L)
    val quality = graft.ml.TextAnalysis.quality(docs)
      .filter(col("n_tokens") >= 30).select("doc_id").as[Long].collect().toSet
    val contaminated = Corpus.decontaminate(docs, evalPred)
      .select("doc_id").as[Long].collect().toSet
    val losers = Corpus.dedupClusters(docs)
      .filter(col("doc_id") =!= col("rep")).select("doc_id").as[Long].collect().toSet
    val sampled = (0L to 9L).filter(id => (id * 48271L + 11L) % 1000L < 500L).toSet
    val expected = notEval & quality & sampled -- contaminated -- losers
    assert(got === expected)
    assert(got === Set(5L, 8L),
      "keeper + independent doc survive; eval/contaminated/short/loser do not")
    assert(losers === Set(9L), "the near-dup loser gate must be exercised")
    assert(contaminated === Set(1L), "the decontamination gate must be exercised")
  }

  test("topTokens matches a naive computation (ties broken token-asc)") {
    val df = Seq(
      ("en", "b a a c b a"), ("en", "c b d"),
      ("de", "x y x")).toDF("lang", "text")
    // truth: en → a:3, b:3, c:2, d:1 ; de → x:2, y:1
    val got = Corpus.topTokens(df, k = 2)
      .as[(String, String, Long, Int)].collect().toSet
    assert(got === Set(
      ("en", "a", 3L, 1), ("en", "b", 3L, 2),
      ("de", "x", 2L, 1), ("de", "y", 1L, 2)))
  }

  test("pagerankFixed == scalar power iteration; uniform on a regular graph") {
    // Weighted path a—b—c (symmetrized): the center accumulates rank.
    val path = Seq(
      ("a", "b", 1L), ("b", "a", 1L),
      ("b", "c", 2L), ("c", "b", 2L)).toDF("src", "dst", "w")
    // Scalar reference, identical formula/constants.
    val d = 0.85
    val nodes = Seq("a", "b", "c")
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 2L), ("c", "b", 2L))
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var rank = nodes.map(_ -> 1.0 / 3).toMap
    for (_ <- 1 to 3) {
      val in = nodes.map { v =>
        v -> edges.filter(_._2 == v).map { case (u, _, w) => rank(u) * w / outw(u) }.sum
      }.toMap
      rank = nodes.map(v => v -> ((1.0 - d) / 3 + d * in(v))).toMap
    }
    val got = Corpus.pagerankFixed(path, iters = 3, damping = d)
      .as[(String, Double)].collect().toMap
    for (v <- nodes)
      assert(math.abs(got(v) - rank(v)) < 5e-7, s"$v: got ${got(v)}, want ${rank(v)}")
    assert(got("b") > got("a") && got("b") > got("c"), "center of the path dominates")
    // Regular symmetric graph (triangle, equal weights): stationary from
    // the uniform start — every iteration preserves 1/n exactly.
    val tri = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"), ("c", "a"))
      .map { case (s, t) => (s, t, 1L) }.toDF("src", "dst", "w")
    val uni = Corpus.pagerankFixed(tri, iters = 3, damping = d)
      .as[(String, Double)].collect().toMap
    for (v <- nodes) assert(math.abs(uni(v) - 1.0 / 3) < 5e-7) // 6-dp output grain
    // Total mass conserved (no dangling nodes in a symmetric graph).
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("mixtureSample: exact quotas, deterministic hash-rank selection, empty-stratum cap") {
    // a: 10 docs, b: 6, c: 4; targets 0.5/0.3/0.2 (already normalized).
    val docs = ((0L to 9L).map(("a", _)) ++ (10L to 15L).map(("b", _)) ++
      (16L to 19L).map(("c", _))).toDF("source", "doc_id")
    val targets = Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    // Scalar mirror of the quota formula (same double ops).
    val z = targets.map(_._2).sum
    val n = Map("a" -> 10L, "b" -> 6L, "c" -> 4L)
    val p = targets.map { case (s, w) => s -> w / z }.toMap
    val t = targets.map { case (s, _) => math.floor(n(s) / p(s)).toLong }.min
    val quota = p.map { case (s, ps) => s -> math.floor(t * ps).toLong }
    // Scalar mirror of the per-source hash-rank selection.
    def hkey(id: Long) = (id * 48271L + 11L) % 1000003L
    val want = (for {
      (s, ids) <- Seq("a" -> (0L to 9L), "b" -> (10L to 15L), "c" -> (16L to 19L))
      (id, i) <- ids.sortBy(id => (hkey(id), id)).zipWithIndex
      if i < quota(s)
    } yield (s, id, i + 1L)).toSet
    val got = Corpus.mixtureSample(docs, targets, parts = 4)
      .as[(String, Long, Long)].collect().toSet
    assert(got === want)
    // proportions hold exactly at the quota grain
    assert(got.groupBy(_._1).view.mapValues(_.size.toLong).toMap === quota)
    // partitioning-invariance: same result from a different physical layout
    val re = Corpus.mixtureSample(docs.repartition(7), targets, parts = 3)
      .as[(String, Long, Long)].collect().toSet
    assert(re === want)
    // a target source with no documents caps the feasible total at 0
    assert(Corpus.mixtureSample(docs, targets :+ ("ghost" -> 0.1)).count() === 0L)
  }

  test("withRunningSum == per-group window cumsum; invariant to parts and layout") {
    val rnd = new scala.util.Random(99)
    val rows = (0L until 200L).map(i =>
      (s"g${rnd.nextInt(5)}", i, rnd.nextInt(50).toLong)).toDF("g", "id", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = rows.withColumn("cum", sum($"v").over(w))
      .as[(String, Long, Long, Long)].collect().toSet
    for ((parts, layout) <- Seq((1, rows), (3, rows.repartition(7)),
        (32, rows.repartition(2)))) {
      val got = graft.operators.GlobalOrder.withRunningSum(
        layout, "g", "v", Seq($"g", $"id"), parts, "cum")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got === want, s"parts=$parts")
    }
  }

  test("withRunningSumAndRank == window cumsum + row_number; invariant to parts/layout") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 200L).map(i => (i, rnd.nextInt(50).toLong)).toDF("id", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"v".desc, $"id")
    val want = rows
      .withColumn("cum", sum($"v").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet
    for ((parts, layout) <- Seq((1, rows), (3, rows.repartition(7)),
        (32, rows.repartition(2)))) {
      val got = graft.operators.GlobalOrder.withRunningSumAndRank(
        layout, "v", Seq($"v".desc, $"id"), parts, "cum", "rk")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === want, s"parts=$parts")
    }
  }

  test("tokenBudgetMixture: greedy hash-order prefix fill per source") {
    // a: plentiful short docs; b: few long docs; c: supply below quota.
    val docs = ((0L to 19L).map(i => ("a", i, "w " * (i % 5 + 1).toInt + "end")) ++
      (20L to 24L).map(i => ("b", i, "x " * 30 + "end")) ++
      (25L to 26L).map(i => ("c", i, "y y y"))).toDF("source", "doc_id", "text")
    val targets = Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val budget = 100L
    // Scalar mirror: greedy fill in (hkey, doc_id) order until the source's
    // cumulative count reaches quota (crossing doc kept).
    val z = targets.map(_._2).sum
    val quota = targets.map { case (s, p) => s -> math.floor(p / z * budget).toLong }.toMap
    def hkey(id: Long) = (id * 48271L + 11L) % 1000003L
    def ntok(text: String) = text.split(" ", -1).length.toLong
    val byDoc = docs.as[(String, Long, String)].collect()
    val want = (for ((s, rows) <- byDoc.groupBy(_._1).toSeq) yield {
      var cum = 0L
      rows.sortBy(r => (hkey(r._2), r._2)).flatMap { case (_, id, text) =>
        val before = cum; cum += ntok(text)
        if (before < quota(s)) Some((s, id, ntok(text), cum)) else None
      }
    }).flatten.toSet
    val got = Corpus.tokenBudgetMixture(docs, targets, budget, parts = 4)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
    // quota semantics: each source's kept tokens reach its quota (or take
    // the whole supply), and removing the LAST kept doc drops below quota
    val supply = byDoc.groupBy(_._1).view.mapValues(_.map(r => ntok(r._3)).sum).toMap
    for ((s, rows) <- got.groupBy(_._1)) {
      val kept = rows.toSeq.map(_._3).sum
      assert(kept >= math.min(quota(s), supply(s)), s"source $s underfilled")
      val last = rows.maxBy(_._4)
      assert(last._4 - last._3 < quota(s), s"source $s overfilled")
    }
    // partitioning-invariance (different layout + parts)
    val re = Corpus.tokenBudgetMixture(docs.repartition(5), targets, budget, parts = 2)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(re === want)
  }

  /** Scalar type-7 quantile (linear interpolation at rank p·(n−1)) — the
    * definition lengthQuantiles, DuckDB quantile_cont and numpy's default
    * all share. */
  private def q7(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val pos = p * (s.length - 1)
    val lo = pos.toInt
    if (lo == s.length - 1) s(lo)
    else s(lo) + (s(lo + 1) - s(lo)) * (pos - lo)
  }

  test("lengthQuantiles == scalar type-7 interpolation; approx path within rank error") {
    // token counts: srcA docs of length 1..5, srcB lengths {2, 10}
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = ((1 to 5).map(n => (n.toLong, "srcA", words(n))) ++
      Seq((10L, "srcB", words(2)), (11L, "srcB", words(10))))
      .toDF("doc_id", "source", "text")
    val ps = Seq(0.5, 0.9, 0.99)
    val got = Corpus.lengthQuantiles(docs, ps)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, Seq(r._3, r._4, r._5))).toMap
    val lens = Map("srcA" -> (1 to 5).map(_.toDouble),
      "srcB" -> Seq(2.0, 10.0))
    for ((src, (n, qs)) <- got) {
      assert(n === lens(src).length)
      for ((p, g) <- ps.zip(qs)) {
        val want = BigDecimal(q7(lens(src), p))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(g - want) < 1e-9, s"$src p$p: got $g want $want")
      }
    }
    // the sketch path returns actual data values at rank-accuracy —
    // exact at this accuracy/size, and always a member of the value set
    val approx = Corpus.lengthQuantilesApprox(docs, ps)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._3, r._4, r._5)).toMap
    for ((src, qs) <- approx; q <- qs)
      assert(lens(src).contains(q), s"$src approx $q not a data value")
    assert(approx("srcA")(0) === 3.0) // exact median at this size
    // fractional percentiles get exact-decimal labels (0.995/0.999 would
    // both collide at "p100" under whole-percent rounding)
    val cols = Corpus.lengthQuantiles(docs, Seq(0.995, 0.999)).columns.toSeq
    assert(cols === Seq("source", "n_docs", "p99_5", "p99_9"))
  }

  test("HLL token sketches: per-source estimate within 5% of exact; union == global sketch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source").agg(countDistinct("tok").as("n"))
      .as[(String, Long)].collect().toMap
    val est = Corpus.distinctTokenSketches(docs)
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    for ((src, n) <- exact)
      assert(math.abs(est(src) - n) <= math.max(2.0, 0.05 * n),
        s"$src: est ${est(src)} vs exact $n")
    // mergeability: union of the per-source sketches == one sketch over
    // the whole corpus (segment → corpus re-aggregation, no rescan)
    val merged = Corpus.mergeTokenSketches(Corpus.tokenSketches(docs))
      .as[Long].head()
    val global = Corpus.mergeTokenSketches(
      Corpus.tokenSketches(docs.withColumn("source", lit("all"))))
      .as[Long].head()
    assert(merged === global, s"merged $merged vs global $global")
  }

  test("storyThreads: time-gated near-dup components, thread-grain rollup") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    def variant(tail: String) = (1 to 39).map(i => s"w$i").mkString(" ") + " " + tail
    val baseB = (1 to 40).map(i => s"v$i").mkString(" ")
    def variantB(tail: String) = (1 to 39).map(i => s"v$i").mkString(" ") + " " + tail
    val docs = Seq(
      (1L, "en", base, ts("2024-01-01 00:00:00")),
      (2L, "en", variant("x2"), ts("2024-01-01 01:00:00")),
      (3L, "en", variant("x3"), ts("2024-01-01 02:00:00")),
      // near-dup of 1-3 but 8h+ from every member: no edge, no thread
      (4L, "en", variant("x4"), ts("2024-01-01 10:00:00")),
      (5L, "en", "totally unrelated text entirely here", ts("2024-01-01 00:30:00")),
      // second family: gap EXACTLY maxGapSec (inclusive bound)
      (6L, "en", baseB, ts("2024-01-02 00:00:00")),
      (7L, "en", variantB("y7"), ts("2024-01-02 03:00:00")))
      .toDF("doc_id", "lang", "text", "ts")
    val got = Corpus.storyThreads(docs, threshold = 0.5, maxGapSec = 10800L)
      .select("thread", "n_articles", "first_ts", "last_ts", "span_sec")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    assert(got === Set(
      (1L, 3L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00"), 7200L),
      (6L, 2L, ts("2024-01-02 00:00:00"), ts("2024-01-02 03:00:00"), 10800L)))
  }

  test("storyThreads: transitive threading spans beyond one gap window") {
    // 1-2 and 2-3 are inside the window, 1-3 is not: connected components
    // must still place all three in ONE thread (the follow-up chain case).
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def variant(tail: String) = (1 to 39).map(i => s"w$i").mkString(" ") + " " + tail
    val docs = Seq(
      (1L, "en", variant("a"), ts("2024-01-01 00:00:00")),
      (2L, "en", variant("b"), ts("2024-01-01 02:00:00")),
      (3L, "en", variant("c"), ts("2024-01-01 04:00:00")))
      .toDF("doc_id", "lang", "text", "ts")
    val got = Corpus.storyThreads(docs, threshold = 0.5, maxGapSec = 10800L)
      .select("thread", "n_articles", "span_sec")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 14400L)))
  }

  test("dedupParagraphs: corpus-wide keep-first, in-doc order, all-dropped doc") {
    val paras = Seq(
      // doc 1: unique content + the shared footer (first occurrence — kept)
      (1L, Seq("alpha beta", "footer boilerplate")),
      // doc 2: repeats the footer (dropped) AND repeats its own paragraph
      // within the doc (second copy dropped), keeps unique middle
      (2L, Seq("gamma delta", "gamma delta", "footer boilerplate", "epsilon")),
      // doc 3: every paragraph already seen → survives with n_kept = 0
      (3L, Seq("alpha beta", "footer boilerplate")),
      // doc 4: order preservation — kept paragraphs rebuild in idx order
      (4L, Seq("zeta", "alpha beta", "eta")))
      .toDF("doc_id", "paras")
    val got = Corpus.dedupParagraphs(paras)
      .select("doc_id", "n_paras", "n_kept", "text_dedup")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === Set(
      (1L, 2L, 2L, "alpha beta\nfooter boilerplate"),
      (2L, 4L, 2L, "gamma delta\nepsilon"),
      (3L, 2L, 0L, ""),
      (4L, 3L, 2L, "zeta\neta")))
  }

  test("vocabCoverage: rank order, cumulative shares, full-vocab closure") {
    // stream: a×4, b×3, c×2, d×1 → total 10
    val docs = Seq((1L, "a a b c"), (2L, "a b c d"), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = Corpus.vocabCoverage(docs, topK = 10)
      .select("rank", "token", "tf", "cum_frac")
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a", 4L, 0.4), (2L, "b", 3L, 0.7),
      (3L, "c", 2L, 0.9), (4L, "d", 1L, 1.0)))
    // ties rank token-asc deterministically
    val tied = Corpus.vocabCoverage(Seq((1L, "x y")).toDF("doc_id", "text"), 10)
      .select("rank", "token").as[(Long, String)].collect().sortBy(_._1)
    assert(tied.toSeq === Seq((1L, "x"), (2L, "y")))
  }

  test("dedupAgainstCorpus: corpus hit dropped, batch keeper kept, fresh kept") {
    val existing = Seq((1L, "old story one", "en", "s0"),
      (2L, "old story two", "en", "s0")).toDF("doc_id", "text", "lang", "source")
    val incoming = Seq(
      (10L, "old story one", "en", "s1"),   // exact re-crawl → dropped
      (11L, "wire flash", "en", "s1"),      // batch dup group: min id kept
      (12L, "wire flash", "en", "s2"),      //   → dropped
      (13L, "genuinely new", "en", "s1"))   // fresh → kept
      .toDF("doc_id", "text", "lang", "source")
    val got = Corpus.dedupAgainstCorpus(existing, incoming)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(got === Set((11L, "s1"), (13L, "s1")))
  }

  test("exactStratifiedSample: exact k per stratum, short strata whole, key-stable, group-limit plan") {
    // Strata of size 12 / 12 / 3 with k = 5: exact allocation for the big
    // strata, the short stratum kept whole.
    val docs = ((0L until 12L).map(i => (i, "a", "en", "s0")) ++
      (100L until 112L).map(i => (i, "b", "en", "s1")) ++
      Seq((200L, "c", "en", "s2"), (201L, "c", "en", "s2"), (202L, "c", "en", "s2")))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.exactStratifiedSample(docs, k = 5)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc === Map("s0" -> 5L, "s1" -> 5L, "s2" -> 3L))
    // Rank is dense 1..k within each stratum.
    val ranks = out.select("source", "rnk").as[(String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(ranks("s0") === (1 to 5) && ranks("s2") === (1 to 3))
    // Key-stable: same selected SET under a different partitioning.
    val out2 = Corpus.exactStratifiedSample(docs.repartition(7, col("lang")), k = 5)
    assert(out.select("doc_id").as[Long].collect().toSet ===
      out2.select("doc_id").as[Long].collect().toSet)
    // Scale pin: the rank runs through WindowGroupLimit with a PARTIAL pass
    // below the exchange (maps emit ≤ k rows per stratum, never the stratum).
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
    assert(plan.contains("Partial"), "partial group-limit below the exchange\n" + plan.take(800))
  }

  test("dedupKeepBest: longest cluster member wins, min-id tie-break, one keeper per cluster") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      // Cluster A: 2L is the longest member and must beat the min-id rep.
      (1L, base, "en"),
      (2L, base + " w11 w12", "en"),
      // Cluster B: identical texts → equal n_tokens → min doc_id keeps.
      (10L, "x1 x2 x3 x4 x5", "en"),
      (11L, "x1 x2 x3 x4 x5", "en"),
      // Unclustered: never appears (same contract as dedupClusters).
      (20L, "z1 z2 z3 z4 z5 z6", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Corpus.dedupKeepBest(docs, threshold = 0.5)
      .select("doc_id", "rep", "cluster_size", "n_tokens", "keeper", "is_keeper")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.map(_._1).toSet === Set(1L, 2L, 10L, 11L))
    val byDoc = got.map(r => r._1 -> r).toMap
    assert(byDoc(1L)._5 === 2L && !byDoc(1L)._6, "longer member 2 is A's keeper")
    assert(byDoc(2L)._5 === 2L && byDoc(2L)._6)
    assert(byDoc(10L)._5 === 10L && byDoc(10L)._6, "tie → min doc_id keeps")
    assert(byDoc(11L)._5 === 10L && !byDoc(11L)._6)
    // Exactly one keeper per cluster.
    val keepersPerRep = got.groupBy(_._2).view.mapValues(_.count(_._6)).toMap
    assert(keepersPerRep.values.forall(_ == 1))
  }

  test("contaminationShare: graded overlap, zero-overlap mass kept, sub-n docs 0.0") {
    val docs = Seq(
      (0L, "a b c d e", "en"),        // eval (doc_id % 2 == 0 below)
      (1L, "a b c x y z", "en"),      // 4 grams, shares "a b c" → 1/4
      (3L, "p q r s", "en"),          // 2 grams, no overlap → 0.0
      (5L, "a b", "en"))              // sub-3-token → n_grams 0, 0.0
      .toDF("doc_id", "text", "lang")
    val got = Corpus.contaminationShare(docs, col("doc_id") % 2 === 0)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 3L, 5L))
    assert(got(1L) === ((1L, 4L, 1L, 0.25)))
    assert(got(3L) === ((3L, 2L, 0L, 0.0)))
    assert(got(5L) === ((5L, 0L, 0L, 0.0)))
  }

  test("sequencePack == scalar chunked packing; bounded overflow; partitioning-stable") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val budget = 256L
    val got = Corpus.sequencePack(docs, budget)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // scalar truth: same LCG order, same running sum, same div rule
    def hkey(id: Long) = (((id * 48271L + 11L) % 1000003L) + 1000003L) % 1000003L
    val scalar = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split(" ", -1).length.toLong) }
      .sortBy { case (id, _) => (hkey(id), id) }
    var cum = 0L
    for ((id, n) <- scalar) {
      assert(got(id) === ((id, n, cum, cum / budget)), s"doc $id")
      cum += n
    }
    // bounded overflow: a pack exceeds the budget by < max doc length
    val maxLen = scalar.map(_._2).max
    val packTotals = got.values.groupBy(_._4).view.mapValues(_.map(_._2).sum)
    assert(packTotals.values.forall(_ < budget + maxLen),
      "pack overflow exceeded the chunked-packing bound")
    // key-stable under a different partitioning
    val again = Corpus.sequencePack(docs.repartition(7), budget)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again === got)
  }

  test("curriculum: global rank == scalar reorder of the q55 scores; parts-invariant") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val got = Corpus.curriculum(docs)
      .as[(Long, Double, Long)].collect()
    val byScore = got.sortBy { case (id, s, _) => (-s, id) }
    assert(byScore.map(_._3).toSeq === (1L to got.length), "rank order broken")
    val again = Corpus.curriculum(docs.repartition(5), parts = 3)
      .as[(Long, Double, Long)].collect().toSet
    assert(again === got.toSet, "curriculum not invariant to partitioning/parts")
  }

  test("datasheet: per-lang counts, extremes, mean and token share (hand truth)") {
    val docs = Seq(
      (1L, "a b c", "en", "s0"),     // 3 tokens
      (2L, "d e f g h", "en", "s1"), // 5
      (3L, "x y", "fr", "s0"))       // 2
      .toDF("doc_id", "text", "lang", "source")
    val got = Corpus.datasheet(docs)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("en") === (("en", 2L, 2L, 8L, 3L, 5L, 4.0, 0.8)))
    assert(got("fr") === (("fr", 1L, 1L, 2L, 2L, 2L, 2.0, 0.2)))
  }

  test("boilerplateShingles: template shingles cross the threshold, content never does") {
    val footer = " subscribe now please do"
    val docs = Seq(
      (1L, "alpha beta gamma delta" + footer, "s0"),
      (2L, "epsilon zeta eta theta" + footer, "s0"),
      (3L, "iota kappa lambda mu" + footer, "s0"),
      (4L, "nu xi omicron pi", "s0")) // one doc without the template
      .toDF("doc_id", "text", "source")
    val got = Corpus.boilerplateShingles(docs, minFrac = 0.6)
      .as[(String, String, Long, Long, Double)].collect()
    // footer-internal shingles ("subscribe now please", "now please do")
    // appear in 3/4 docs; boundary shingles are doc-specific (1/4 < 0.6).
    assert(got.map(_._2).toSet === Set("subscribe now please", "now please do"))
    assert(got.forall(r => r._3 === 3L && r._4 === 4L && r._5 === 0.75))
  }

  test("hostQualityBlocklist: per-host bad share, block flag at the threshold boundary") {
    val docs = Seq(
      (1L, "a b", "s0"), (2L, "c d", "s0"), (3L, "e f g h", "s0"), // 2/3 bad
      (4L, "a b c d", "s1"), (5L, "x y", "s1"),                    // 1/2 bad
      (6L, "p q r s", "s2"))                                       // 0/1 bad
      .toDF("doc_id", "text", "source")
    val got = Corpus.hostQualityBlocklist(docs, minTokens = 3, maxBadFrac = 0.5)
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s0") === (("s0", 3L, 2L, 0.6667, true)))
    // exactly AT the threshold is NOT blocked (strict >)
    assert(got("s1") === (("s1", 2L, 1L, 0.5, false)))
    assert(got("s2") === (("s2", 1L, 0L, 0.0, false)))
  }

  test("syndicationPairs: cross-host near-dup rollup, same-host pairs excluded, ordered hosts") {
    val a = "m1 m2 m3 m4 m5 m6 m7 m8"
    val b = "n1 n2 n3 n4 n5 n6 n7 n8"
    val docs = Seq(
      (1L, a, "en", "hostB"), (2L, a, "en", "hostA"),   // cross-host dup
      (3L, b, "en", "hostA"), (4L, b, "en", "hostC"),   // cross-host dup
      (5L, a, "en", "hostB"),                           // same-host dup w/ 1
      (6L, "u1 u2 u3 u4 u5", "en", "hostC"))            // unique
      .toDF("doc_id", "text", "lang", "source")
    val got = Corpus.syndicationPairs(docs, threshold = 0.5)
      .as[(String, String, Long)].collect().toSet
    // doc pairs (1,2),(2,5) cross hostA/hostB; (3,4) crosses hostA/hostC;
    // (1,5) is same-host and must not count.
    assert(got === Set(("hostA", "hostB", 2L), ("hostA", "hostC", 1L)))
  }

  test("bpeTrain == scalar reference BPE (counts, tie-breaks, greedy-leftmost apply)") {
    // Independent scalar re-implementation (Sennrich et al. 2016 reference
    // shape): word counts → per-round overlapping pair counts → argmax by
    // (count desc, pair asc) → greedy leftmost non-overlapping merge.
    def refBpe(words: Map[String, Long], numMerges: Int): Seq[(Int, String, String, Long)] = {
      def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
          else { out += syms(i); i += 1 }
        }
        out.result()
      }
      var vocab: Map[Vector[String], Long] =
        words.map { case (w, c) => (w.split("").toVector :+ "</w>") -> c }
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var r = 1
      var done = false
      while (r <= numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
        for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) += c
        if (counts.isEmpty) done = true
        else {
          val ((l, rr), cnt) = counts.minBy { case ((l, rr), c) => (-c, l, rr) }
          out += ((r, l, rr, cnt))
          vocab = vocab.toSeq.map { case (s, c) => applyMerge(s, l, rr) -> c }.toMap
          r += 1
        }
      }
      out.result()
    }
    // Classic BPE corpus plus an aaa-run (exercises overlapping-pair
    // counting AND leftmost non-overlap application) across two docs.
    val docs = Seq(
      (1L, "low low low lower lower newest newest newest widest aaa"),
      (2L, "low lower newest widest widest aaa aaa new new"))
      .toDF("doc_id", "text")
    val wordCounts = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    val want = refBpe(wordCounts, numMerges = 12)
    val got = Corpus.bpeTrain(docs, numMerges = 12)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
  }

  test("bpeTrain stops early when every word is one symbol") {
    // 'a b' exhausts after two merges (a+</w>, b+</w>): no pairs remain.
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val got = Corpus.bpeTrain(docs, numMerges = 10)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(got.length === 2)
    assert(got(0) === ((1, "a", "</w>", 2L))) // count 2 beats b's 1
    assert(got(1) === ((2, "b", "</w>", 1L)))
  }

  test("qualityBuckets: tercile cuts over the LM score, at-cut docs fall to the lower bucket") {
    // 6 docs built from a 3-word vocabulary so the unigram scores are
    // hand-computable: docs of only the most common word score highest.
    val docs = Seq(
      (1L, "c c c c"), (2L, "c c c b"), (3L, "c c b b"),
      (4L, "c b b a"), (5L, "b b a a"), (6L, "a a a a"))
      .toDF("doc_id", "text")
    val got = Corpus.qualityBuckets(docs)
      .as[(Long, Long, Double, String)].collect().map(r => r._1 -> r).toMap
    // Scores are strictly decreasing in doc_id here (more 'c' = more
    // common = higher mean logp), so terciles are {1,2} head, {3,4}
    // middle, {5,6} tail — EXCEPT docs exactly AT an interpolated cut
    // drop to the lower bucket. Compute the truth the same way.
    val scored = graft.ml.TextAnalysis.unigramLogProb(docs)
      .as[(Long, Long, Double)].collect().sortBy(_._3)
    val xs = scored.map(_._3)
    def typ7(p: Double): Double = {
      val h = (xs.length - 1) * p
      val lo = xs(h.toInt)
      lo + (h - h.toInt) * (xs(math.min(h.toInt + 1, xs.length - 1)) - lo)
    }
    val (c1, c2) = (typ7(1.0 / 3), typ7(2.0 / 3))
    for ((id, n, s) <- scored) {
      val want = if (s > c2) "head" else if (s > c1) "middle" else "tail"
      assert(got(id) === ((id, n, s, want)), s"doc $id score $s cuts ($c1,$c2)")
    }
    assert(Set("head", "middle", "tail").subsetOf(got.values.map(_._4).toSet))
  }

  test("bpeEncode == scalar reference encode; empty merge table = chars+1 per word") {
    val docs = Seq(
      (1L, "low lower lowest low"),
      (2L, "newest newest low wide"))
      .toDF("doc_id", "text")
    val merges = Corpus.bpeTrain(docs, numMerges = 8)
    val rules = merges.select("rank", "left", "right")
      .as[(Int, String, String)].collect().sortBy(_._1).map(t => (t._2, t._3)).toSeq
    def encLen(word: String): Long = {
      var syms: Vector[String] = word.split("").toVector :+ "</w>"
      for ((a, b) <- rules) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
          else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }
    def expected(id: Long, text: String): (Long, Long, Long, Double) = {
      val ws = text.split(" ")
      val bpe = ws.map(encLen).sum
      (id, ws.length.toLong, bpe,
        BigDecimal(bpe.toDouble / ws.length).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Corpus.bpeEncode(docs, merges)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq(expected(1L, "low lower lowest low"), expected(2L, "newest newest low wide")))
    // merges strictly shrink the encoding vs the character baseline...
    val empty = Seq.empty[(Int, String, String, Long)].toDF("rank", "left", "right", "pair_count")
    val raw = Corpus.bpeEncode(docs, empty)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // ...which is chars+1 symbols per word (the </w> marker).
    assert(raw.map(_._3) === Seq(
      "low lower lowest low".split(" ").map(_.length + 1L).sum,
      "newest newest low wide".split(" ").map(_.length + 1L).sum))
    assert(got.zip(raw).forall { case (g, r) => g._3 < r._3 })
  }

  test("chunkWindows: offsets, overlap, trailing remainder, non-overlap reconstruction") {
    val docs = Seq((7L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val got = Corpus.chunkWindows(docs, window = 3, stride = 2)
      .as[(Long, Long, Int, String)].collect().sortBy(_._2)
    assert(got.toSeq === Seq(
      (7L, 0L, 3, "t1 t2 t3"), (7L, 1L, 3, "t3 t4 t5"),
      (7L, 2L, 3, "t5 t6 t7"), (7L, 3L, 1, "t7")))
    // stride == window ⇒ chunks partition the doc: concatenation restores it.
    val nonOv = Corpus.chunkWindows(docs, window = 3, stride = 3)
      .as[(Long, Long, Int, String)].collect().sortBy(_._2)
    assert(nonOv.map(_._4).mkString(" ") === "t1 t2 t3 t4 t5 t6 t7")
    // consistency: n_tokens is the chunk's own token count, bounded by window.
    for ((_, _, n, txt) <- got) assert(n === txt.split(" ").length && n <= 3)
  }

  test("importanceWeights == scalar mirror; target-like raw docs score higher; target excluded") {
    val docs = Seq(
      (1L, "tgt tgt alpha", "T"), (2L, "tgt beta", "T"),  // target side
      (3L, "tgt alpha raw", "R"),                         // raw, target-like
      (4L, "raw raw beta", "R"),                          // raw, off-domain
      (5L, "zzz", "R"))                                   // raw-only token
      .toDF("doc_id", "text", "grp")
    val rows = docs.as[(Long, String, String)].collect()
    val toks = rows.flatMap { case (id, t, g) => t.split(" ").map(tok => (id, g == "T", tok)) }
    val vocab = toks.map(_._3).distinct.sorted
    val v = vocab.length.toDouble
    val ct = vocab.map(w => w -> toks.count(t => t._2 && t._3 == w).toDouble).toMap
    val cr = vocab.map(w => w -> toks.count(t => !t._2 && t._3 == w).toDouble).toMap
    val (nt, nr) = (ct.values.sum, cr.values.sum)
    def lr(w: String) =
      math.log((ct(w) + 1.0) / (nt + v)) - math.log((cr(w) + 1.0) / (nr + v))
    def weight(id: Long): Double = {
      val ws = rows.find(_._1 == id).get._2.split(" ")
      val raw = ws.groupBy(identity).map { case (w, occ) => occ.length * lr(w) }.sum / ws.length
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Corpus.importanceWeights(docs, col("grp") === "T")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(3L, 4L, 5L), "target docs excluded")
    for (id <- Seq(3L, 4L, 5L))
      assert(got(id) === ((id, rows.find(_._1 == id).get._2.split(" ").length.toLong, weight(id))))
    // target-like raw doc on top; the all-raw doc ranks below even the
    // unseen-token doc (smoothing caps the unseen penalty).
    assert(got(3L)._3 > got(5L)._3 && got(5L)._3 > got(4L)._3)
  }

  test("qualityClassifier: scalar-GD parity and planted-signal separation") {
    val target = (1L to 8L).map(i =>
      (i, ("quality prose facts figures sources " * 2).trim + " extra" * (i % 3).toInt, true))
    val raw = (11L to 18L).map(i =>
      (i, ("spam junk click buy cheap now " * 2).trim + " ads" * (i % 3).toInt, false))
    val docs = (target ++ raw).toDF("doc_id", "text", "is_t")
    val dim = 32; val iters = 20; val lr = 2.0
    val got = Corpus.qualityClassifier(docs, col("is_t"), dim, iters, lr)
      .as[(Long, Double, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // perfect separation on separable vocab + label passthrough
    val tMin = (1L to 8L).map(got(_)._1).min
    val rMax = (11L to 18L).map(got(_)._1).max
    assert(tMin > rMax, s"target min $tMin !> raw max $rMax")
    assert((1L to 8L).forall(d => got(d)._2 && got(d)._3))
    assert((11L to 18L).forall(d => !got(d)._2 && !got(d)._3))
    // scalar full-batch GD on the SAME hashed features == the op's scores
    val feats = Corpus.hashedFeatures(docs, dim)
      .as[(Long, Int, Double)].collect()
    val ys = docs.select($"doc_id", $"is_t".cast("double"))
      .as[(Long, Double)].collect().toMap
    val byDoc = feats.groupBy(_._1)
    val w = Array.fill(dim + 1)(0.0)
    for (_ <- 1 to iters) {
      val resid = byDoc.map { case (d, fs) =>
        val m = fs.map(f => w(f._2) * f._3).sum
        d -> (1.0 / (1.0 + math.exp(-m)) - ys(d))
      }
      val g = Array.fill(dim + 1)(0.0)
      feats.foreach(f => g(f._2) += f._3 * resid(f._1))
      for (i <- 0 to dim) w(i) -= lr * g(i) / ys.size
    }
    for ((d, fs) <- byDoc) {
      val p = 1.0 / (1.0 + math.exp(-fs.map(f => w(f._2) * f._3).sum))
      assert(math.abs(p - got(d)._1) < 6e-5, s"doc $d: scalar $p vs ${got(d)._1}")
    }
  }

  private def round2(x: Double): Double = math.round(x * 10000).toDouble / 10000

  test("distinctN: hand truth per (lang, n) incl. repeats and sub-n docs") {
    val docs = Seq(
      (1L, "a b a b", "en"),   // 1: 4/2, 2: 3/2 ("a b" repeats), 3: 2/2
      (2L, "x y z", "fr"),     // 1: 3/3, 2: 2/2, 3: 1/1
      (3L, "k", "fr")          // adds one 1-gram; no 2/3-grams
    ).toDF("doc_id", "text", "lang")
    val got = Corpus.distinctN(docs, maxN = 3)
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("en", 1)) === ((4L, 2L, 0.5)))
    assert(got(("en", 2)) === ((3L, 2L, round2(2.0 / 3))))
    assert(got(("en", 3)) === ((2L, 2L, 1.0)))
    assert(got(("fr", 1)) === ((4L, 4L, 1.0)))
    assert(got(("fr", 2)) === ((2L, 2L, 1.0)))
    assert(got(("fr", 3)) === ((1L, 1L, 1.0)))
    assert(!got.contains(("fr", 4)) && got.size === 6)
  }

  test("zipfSlope: closed-form OLS truth; constant frequencies give slope 0") {
    val docs = Seq(
      (1L, "a a a a b b c", "en"),  // tf 4,2,1 → ranks 1,2,3
      (2L, "p q r", "de")           // all tf 1 → flat → slope 0
    ).toDF("doc_id", "text", "lang")
    val got = Corpus.zipfSlope(docs)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val slope = (n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum) /
      (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(got("en") === ((3L, round2(slope))))
    assert(got("de")._1 === 3L)
    assert(math.abs(got("de")._2) === 0.0)
  }

  test("heavyHitters: exact regime equals true counts; merge == direct global") {
    val docs = Seq(
      (1L, "a a a b b c", "s1"),
      (2L, "a b c c c c", "s1"),
      (3L, "z z z y", "s2")
    ).toDF("doc_id", "text", "source")
    val perSource = Corpus.frequencySketches(docs, maxMapSize = 16)
    val got = Corpus.heavyHitters(perSource, threshold = 2L)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // true counts: s1 {a:4, b:3, c:5}, s2 {z:3, y:1}; the threshold is
    // INCLUSIVE on the upper bound (ub >= t), so t=2 drops only y.
    assert(got === Set(
      ("s1", "a", 4L, 4L, 4L), ("s1", "b", 3L, 3L, 3L), ("s1", "c", 5L, 5L, 5L),
      ("s2", "z", 3L, 3L, 3L)))
    // segments → corpus: per-source sketches merged == one global sketch
    val mergedHh = Corpus.heavyHitters(
      Corpus.mergeFrequencySketches(perSource.select("sk")), threshold = 0L)
      .as[(String, Long, Long, Long)].collect().toSet
    val globalHh = Corpus.heavyHitters(
      Corpus.frequencySketches(docs.withColumn("source", lit("all")), maxMapSize = 16)
        .select("sk"), threshold = 0L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(mergedHh === globalHh)
    assert(mergedHh.map(r => r._1 -> r._2).toMap ===
      Map("a" -> 4L, "b" -> 3L, "c" -> 5L, "z" -> 3L, "y" -> 1L))
  }

  test("heavyHitters: eviction regime keeps the no-false-negatives guarantee") {
    // One dominant token + 60 singletons through an 8-counter sketch:
    // the sketch MUST purge, bounds must bracket truth, and the heavy
    // item must survive with est - lb <= maxError.
    val text = (Seq.fill(100)("hot") ++ (1 to 60).map(i => s"rare$i"))
      .mkString(" ")
    val docs = Seq((1L, text, "s")).toDF("doc_id", "text", "source")
    val sk = Corpus.frequencySketches(docs, maxMapSize = 8)
    val rows = Corpus.heavyHitters(sk, threshold = 50L)
      .as[(String, String, Long, Long, Long)].collect()
    val hot = rows.find(_._2 == "hot")
    assert(hot.isDefined, "true-heavy item evicted — guarantee broken")
    val (_, _, est, lb, ub) = hot.get
    assert(lb <= 100L && 100L <= ub && est >= lb && est <= ub)
    // every returned item's bounds bracket its true count
    val truth = text.split(' ').groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    rows.foreach { case (_, tok, _, l, u) =>
      assert(l <= truth(tok) && truth(tok) <= u, s"bounds miss truth for $tok")
    }
  }

  test("qualityClassifier: uninformative features on a balanced slice stay at 0.5") {
    // Identical text everywhere + exactly half target: every gradient
    // coordinate is a sum of cancelling ±v/2 pairs, so w stays ~0 and
    // every score is the base rate.
    val docs = (1L to 8L).map(i => (i, "same words every time", i % 2 == 0))
      .toDF("doc_id", "text", "is_t")
    val got = Corpus.qualityClassifier(docs, col("is_t"), dim = 16, iters = 5)
      .as[(Long, Double, Boolean, Boolean)].collect()
    assert(got.forall(r => math.abs(r._2 - 0.5) < 1e-9))
  }

  test("shardAssign == sequential LPT round-robin; spread bounded by the max doc") {
    // Seeded corpus with skewed sizes (one giant doc, many small) — the
    // regime where doc-count sharding is badly token-unbalanced.
    val rnd = new scala.util.Random(91)
    val docs = (1L to 97L).map { i =>
      val n = if (i == 5L) 400 else 1 + rnd.nextInt(40)
      (i, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val numShards = 7
    val got = Corpus.shardAssign(docs, numShards, parts = 8)
      .as[(Long, Long, Int)].collect()

    // Sequential truth: global sort by (n_tokens desc, doc_id), deal
    // round-robin.
    val sizes = docs.as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split(" ", -1).length.toLong) }
    val truth = sizes.sortBy { case (id, n) => (-n, id) }.zipWithIndex
      .map { case ((id, n), i) => id -> ((n, i % numShards)) }.toMap
    assert(got.length === sizes.length)
    for ((id, n, shard) <- got) {
      assert((n, shard) === truth(id), s"doc $id")
    }
    // Greedy guarantee: max-min token mass across shards <= largest doc.
    val loads = got.groupBy(_._3).map { case (_, rs) => rs.map(_._2).sum }
    assert(loads.size === numShards)
    assert(loads.max - loads.min <= sizes.map(_._2).max,
      s"spread ${loads.max - loads.min} exceeds the greedy bound")
  }

  test("weightedSample == scalar exponential-clocks truth; k >= n returns all") {
    val rnd = new scala.util.Random(29)
    val docs = (1L to 120L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(50))("w").mkString(" "))
    }
    def clock(id: Long, w: Double): Double = {
      val key = (((id * 48271L + 11L) % 1000003L) + 1000003L) % 1000003L
      val u = (key.toDouble + 0.5) / 1000003.0
      BigDecimal(-math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val truth = docs.map { case (id, t) =>
      val w = t.split(" ", -1).length.toDouble
      (id, w.toLong, clock(id, w))
    }.sortBy { case (id, _, c) => (c, id) }
    val k = 25
    val got = graft.ml.Corpus.weightedSample(docs.toDF("doc_id", "text"), k)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._3, r._1)).toSeq
    assert(got === truth.take(k))
    // k >= n: the sample is the whole corpus.
    val all = graft.ml.Corpus.weightedSample(docs.toDF("doc_id", "text"), 500)
      .as[(Long, Long, Double)].collect()
    assert(all.length === docs.size)
  }

  test("temperatureWeights: α=0.5 exact shares, low-resource up-sampled") {
    val docs = ((1 to 8).map(i => (i.toLong, "hi")) ++
      Seq((9L, "lo"), (10L, "lo")))
      .map { case (id, l) => (id, l, s"text $id") }.toDF("doc_id", "lang", "text")
    val got = Corpus.temperatureWeights(docs, alpha = 0.5)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // shares 0.8/0.2; sqrt-temperature → 2/3 vs 1/3 resampled
    assert(got("hi") === ((8L, 0.8, 0.666667, 0.833333)))
    assert(got("lo") === ((2L, 0.2, 0.333333, 1.666667)))
    // resampled shares sum to 1; the rare language's factor exceeds 1
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-5)
  }

  test("tokenDrift: zero on identical halves, (1/3)ln2 on the skewed pair") {
    val same = Seq((0L, "en", "a b c"), (1L, "en", "a b c")).toDF("doc_id", "lang", "text")
    val z = Corpus.tokenDrift(same.filter($"doc_id" === 0), same.filter($"doc_id" === 1))
      .select("kl_new_old").as[Double].collect()
    assert(z === Array(0.0))
    // old "a a a b" vs new "a b b b": KL = (1/3)·ln 2 (hand-computed with
    // add-1 smoothing over V=2, N=4 both sides)
    val old = Seq((0L, "en", "a a a b")).toDF("doc_id", "lang", "text")
    val nw = Seq((1L, "en", "a b b b")).toDF("doc_id", "lang", "text")
    val got = Corpus.tokenDrift(old, nw)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got === Array(("en", 4L, 4L, 2L,
      math.round(math.log(2.0) / 3 * 1e6) / 1e6)))
  }

  test("sourceConcentration: exact HHI/Jain/top-share, q55 entropy, per lang") {
    val docs = (Seq.fill(3)("A") ++ Seq("B")).zipWithIndex
      .map { case (src, i) => (i.toLong, "en", src, "t") } ++
      Seq((10L, "de", "A", "t"), (11L, "de", "B", "t"))
    val got = Corpus.sourceConcentration(
        docs.toDF("doc_id", "lang", "source", "text"))
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // en: A=3, B=1 → top 3/4, HHI 10/16, Jain 16/20, H = ln4 − 3ln3/4
    val hEn = math.round((math.log(4) - 3 * math.log(3) / 4) * 1e6) / 1e6
    assert(got("en") === ((2L, 4L, 0.75, 0.625, 0.8, hEn)))
    // de: perfectly even 1/1 → Jain exactly 1, HHI 1/2, H = ln 2
    assert(got("de") === ((2L, 2L, 0.5, 0.5, 1.0,
      math.round(math.log(2) * 1e6) / 1e6)))
  }

  test("hitsFixed: two unrolled rounds match hand truth; roles separate") {
    // h1 points at a1 (w=2) and a2 (w=1); h2 points at a1 (w=1).
    val edges = Seq(("h1", "a1", 2L), ("h1", "a2", 1L), ("h2", "a1", 1L))
      .toDF("src", "dst", "w")
    val got = Corpus.hitsFixed(edges, iters = 2)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // round 1: a=(3,1), h=(7,3); round 2: a=(17,7), h=(41,17);
    // normalize: auth 17/24, 7/24; hub 41/58, 17/58; pure sinks/sources 0.
    assert(got("a1") === ((math.round(17.0 / 24 * 1e6) / 1e6, 0.0)))
    assert(got("a2") === ((math.round(7.0 / 24 * 1e6) / 1e6, 0.0)))
    assert(got("h1") === ((0.0, math.round(41.0 / 58 * 1e6) / 1e6)))
    assert(got("h2") === ((0.0, math.round(17.0 / 58 * 1e6) / 1e6)))
  }

  test("snapshotOverlap: token-set identity, order/repetition-insensitive, exact ratios") {
    // old: {a b c}, {d e} — new: {c b a a} (same SET as {a b c}), {x y},
    // {d e} duplicated twice in new (distinct-set population counts once).
    val oldDocs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val newDocs = Seq((3L, "c b a a"), (4L, "x y"), (5L, "d e"), (6L, "e d"))
      .toDF("doc_id", "text")
    val got = Corpus.snapshotOverlap(oldDocs, newDocs)
      .as[(Long, Long, Long, Double, Double)].collect()
    // n_old=2, n_new=3 ({a b c},{x y},{d e}), common=2 → J=2/3, cont=2/3.
    assert(got === Array((2L, 3L, 2L, 2.0 / 3.0, 2.0 / 3.0)))
  }

  test("snapshotOverlap: disjoint snapshots give zero overlap") {
    val a = Seq((1L, "a b")).toDF("doc_id", "text")
    val b = Seq((2L, "c d")).toDF("doc_id", "text")
    val got = Corpus.snapshotOverlap(a, b)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got === Array((1L, 1L, 0L, 0.0, 0.0)))
  }

  test("leakageFreeSplit: clusters never straddle splits; singletons split by own id") {
    // Two near-dup clusters (identical texts → J=1 pairs) + singletons.
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon one"),
      (11L, "alpha beta gamma delta epsilon one"),   // cluster with 10
      (20L, "zeta eta theta iota kappa two"),
      (21L, "zeta eta theta iota kappa two"),        // cluster with 20
      (30L, "unique solitary text number three ok"), // singleton
      (31L, "another lonely document four five six") // singleton
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = Corpus.leakageFreeSplit(docs, threshold = 0.5)
      .as[(Long, Long, String)].collect()
    assert(got.length === 6)
    val byDoc = got.map(g => g._1 -> g).toMap
    // cluster members share rep AND split
    assert(byDoc(10L)._2 === 10L && byDoc(11L)._2 === 10L)
    assert(byDoc(10L)._3 === byDoc(11L)._3, "cluster 10 split atomically")
    assert(byDoc(20L)._2 === 20L && byDoc(21L)._3 === byDoc(20L)._3)
    // singletons are their own rep
    assert(byDoc(30L)._2 === 30L && byDoc(31L)._2 === 31L)
    // split rule matches the LCG bucket
    def bucket(rep: Long) = (((rep * 48271L + 11L) % 1000L) + 1000L) % 1000L
    got.foreach { case (_, rep, split) =>
      val want = if (bucket(rep) < 800) "train" else if (bucket(rep) < 900) "val" else "test"
      assert(split === want, s"rep $rep")
    }
  }

  test("writeTrainingShards: committed round-trip, shard layout, manifest gate, balance") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(5 + i % 11)("w").mkString(" "))).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("shards").toString + "/exp"
    Corpus.writeTrainingShards(docs, path, numShards = 4)
    val back = Corpus.readTrainingShards(spark, path)
    // read-back == the assignment, text carried
    val assign = Corpus.shardAssign(docs, 4).as[(Long, Long, Int)].collect().toSet
    assert(back.select("doc_id", "n_tokens", "shard")
      .as[(Long, Long, Int)].collect().toSet === assign)
    assert(back.count() === 30)
    // physical layout: one shard=N dir per shard
    val dirs = new java.io.File(s"$path/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === (0 until 4).map(i => s"shard=$i").toSet)
    // LPT balance survives the round-trip: spread ≤ max doc tokens
    val mass = back.groupBy("shard").agg(sum("n_tokens").as("m"))
      .as[(Int, Long)].collect().map(_._2)
    assert(mass.max - mass.min <= 15L)
    // manifest gates readers: an uncommitted dir refuses
    java.nio.file.Files.delete(java.nio.file.Paths.get(path, "_MANIFEST"))
    intercept[IllegalArgumentException] {
      Corpus.readTrainingShards(spark, path)
    }
    // rewrite recommits (overwrite generation)
    Corpus.writeTrainingShards(docs, path, numShards = 4)
    assert(Corpus.readTrainingShards(spark, path).count() === 30)
  }

  test("noveltyCurve: per-bucket first-occurrence shares") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(h * 3600L))
    // h0: {abc, bcd} both novel; h1: {abc(seen), bce(new)} → 1/2;
    // h2: {abc, bcd, cde} → 1/3 novel.
    val docs = Seq(
      (1L, "a b c d", ts(0)),
      (2L, "a b c e", ts(1)),
      (3L, "a b c d e", ts(2))).toDF("doc_id", "text", "ts")
    val got = Corpus.noveltyCurve(docs)
      .as[(Timestamp, Long, Long, Double)].collect().sortBy(_._1.getTime)
    assert(got.map(g => (g._2, g._3, g._4)).toSeq ===
      Seq((2L, 2L, 1.0), (2L, 1L, 0.5), (3L, 1L, 1.0 / 3.0)))
  }

  test("hardNegatives: near-dups gated out, shared-count ranking, eval docs excluded") {
    // eval doc 0: J(0,1)=3/5 ≥ 0.5 → excluded as near-dup; doc 2 shares
    // 2 terms (rank 1), doc 3 shares 1 (rank 2), doc 4 shares none.
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma epsilon"),
      (2L, "alpha beta zeta eta iota"),
      (3L, "alpha mu nu xi omicron pi"),
      (4L, "stop stop2 stop3 rho")
    ).toDF("doc_id", "text")
    val got = Corpus.hardNegatives(docs, col("doc_id") === 0, k = 5)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(got === Array((0L, 2L, 2L, 1), (0L, 3L, 1L, 2)))
  }

  test("hardNegatives: maxDf pruning changes the similarity universe coherently") {
    // 'the' is in every doc. Unpruned: J(0,1) = 2/4 = 0.5 → doc 1
    // excluded (strict <), docs 2/3 pair only via 'the'. With maxDf=3
    // 'the' leaves the universe: docs 2/3 share nothing, doc 1 shares
    // only 'alpha' (J=1/3 < 0.5) → kept. The gate and the counts move
    // TOGETHER — one coherent pruned universe.
    val docs = Seq(
      (0L, "the alpha beta"),
      (1L, "the alpha zeta"),
      (2L, "the yot zed"),
      (3L, "the kappa lam")
    ).toDF("doc_id", "text")
    val unpruned = Corpus.hardNegatives(docs, col("doc_id") === 0, k = 5)
      .as[(Long, Long, Long, Int)].collect()
    assert(unpruned.map(_._2).toSet === Set(2L, 3L))
    val pruned = Corpus.hardNegatives(docs, col("doc_id") === 0, k = 5, maxDf = 3)
      .as[(Long, Long, Long, Int)].collect()
    assert(pruned.map(_._2).toSet === Set(1L))
    assert(pruned.head._3 === 1L) // shared = {alpha} only
  }

  test("leakageFreeSplit is partitioning-invariant") {
    val docs = (Seq.tabulate(40)(i =>
      (i.toLong, s"doc $i word${i % 7} word${i % 5} filler text body")) ++
      Seq((100L, "dup pair body one two three"), (101L, "dup pair body one two three")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val a = Corpus.leakageFreeSplit(docs, 0.5).as[(Long, Long, String)].collect().toSet
    val b = Corpus.leakageFreeSplit(docs.repartition(7), 0.5)
      .as[(Long, Long, String)].collect().toSet
    assert(a === b)
  }

  test("pmiCollocations == scalar PMI truth; min-count guard; deterministic cut") {
    // "of the" appears 6× (above guard); "the cat" 3×; singletons pruned.
    val docs = Seq(
      (1L, "of the cat of the cat of the cat"),
      (2L, "of the of the of the dog")
    ).toDF("doc_id", "text")
    val got = Corpus.pmiCollocations(docs, minCount = 3L, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // token stream: doc1 = 9 tokens, doc2 = 7 → T = 16; bigrams B = 8 + 6 = 14
    // counts: of=6, the=6, cat=3, dog=1; (of,the)=6, (the,cat)=3, (cat,of)=2
    def pmi(c12: Long, c1: Long, c2: Long): Double = {
      val v = math.log((c12.toDouble / 14.0) /
        ((c1.toDouble / 16.0) * (c2.toDouble / 16.0)))
      math.round(v * 10000).toDouble / 10000
    }
    assert(got.keySet === Set(("of", "the"), ("the", "cat"))) // (cat,of)=2 < guard
    assert(got(("of", "the")) === ((6L, 6L, 6L, pmi(6, 6, 6))))
    assert(got(("the", "cat")) === ((3L, 6L, 3L, pmi(3, 6, 3))))
  }

  test("heapsFit == scalar OLS truth over the prefix curve; partitioning-invariant") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, (0 to i % 5).map(j => s"w${(i * 3 + j) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    // scalar replay in doc_id order
    val seen = scala.collection.mutable.Set.empty[String]
    var cumTok = 0L
    val pts = docs.as[(Long, String)].collect().sortBy(_._1).map { case (_, t) =>
      val toks = t.split(" ", -1)
      cumTok += toks.length
      seen ++= toks
      (math.log(cumTok.toDouble), math.log(seen.size.toDouble))
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val k = math.exp((sy - beta * sx) / n)
    val got = Corpus.heapsFit(docs).as[(Long, Double, Double)].collect()
    assert(got.length === 1)
    assert(got.head._1 === 30L)
    assert(math.abs(got.head._2 - beta) < 1e-3 && math.abs(got.head._3 - k) < 1e-3)
    val re = Corpus.heapsFit(docs.repartition(7)).as[(Long, Double, Double)].collect()
    assert(re.head === got.head) // GlobalOrder prefix sums are partition-stable
  }

  test("epochShuffle: every epoch is a permutation; epochs decorrelate; deterministic") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val got = Corpus.epochShuffle(docs, epochs = 2)
      .as[(Int, Long, Long)].collect()
    for (ep <- Seq(0, 1)) {
      val rows = got.filter(_._1 == ep)
      assert(rows.map(_._2).toSet === (0L until 50L).toSet) // all docs present
      assert(rows.map(_._3).sorted.toSeq === (1L to 50L))   // positions 1..n
    }
    // the two epochs give different orders (decorrelated multipliers)
    val o0 = got.filter(_._1 == 0).sortBy(_._3).map(_._2).toSeq
    val o1 = got.filter(_._1 == 1).sortBy(_._3).map(_._2).toSeq
    assert(o0 !== o1)
    // scalar truth: order by the same multiplicative-hash key — and the
    // key sequence actually WRAPS (mixes) on a tiny contiguous id range
    val m = 4294967296L
    val key0 = (id: Long) => (id * 2654435761L + 1L) % m
    val exp0 = (0L until 50L).sortBy(key0)
    assert(o0 === exp0)
    assert(o0 !== (0L until 50L).toSeq, "shuffle degenerated to identity order")
    // partitioning-invariant (GlobalOrder total order)
    val re = Corpus.epochShuffle(docs.repartition(7), epochs = 2)
      .as[(Int, Long, Long)].collect().toSet
    assert(re === got.toSet)
  }

  test("shardBalanceAudit: entropy identity truth on a hand-dealt corpus") {
    // 4 docs, 2 shards: n_tokens desc, doc_id asc → ranks: d0(4 tok) 1,
    // d1(3) 2, d2(2) 3, d3(1) 4 → shard = (rank-1)%2: d0→0, d1→1, d2→0, d3→1.
    val docs = Seq(
      (0L, "a a a a", "s1"), (1L, "b b b", "s1"),
      (2L, "c c", "s2"), (3L, "d", "s1")).toDF("doc_id", "text", "source")
    val got = Corpus.shardBalanceAudit(docs, numShards = 2)
      .as[(Int, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    def m4(x: Double) = math.round(x * 10000).toDouble / 10000
    // shard 0: {s1:1, s2:1} → H = ln2; shard 1: {s1:2} → H = 0
    assert(got(0) === ((0, 2L, 2L, m4(math.log(2.0)), 0.5)))
    assert(got(1) === ((1, 1L, 2L, 0.0, 1.0)))
  }

  // ---- round 5 (sixth session): KLL length-quantile sketches ----

  test("lengthQuantileSketches: exact regime == a scalar reference sketch; merge identity") {
    import org.apache.datasketches.kll.KllDoublesSketch
    // n per source far below k=200 → no compaction → both the
    // distributed merge and a scalar sketch hold EVERY value exactly
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(i.toInt)("w").mkString(" "), if (i % 2 == 0) "s1" else "s2"))
      .toDF("doc_id", "text", "source")
    val sk = Corpus.lengthQuantileSketches(docs, k = 200)
    val got = Corpus.lengthQuantilesFromSketches(sk)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def scalarRef(vals: Seq[Double]): (Long, Double, Double, Double) = {
      val s = KllDoublesSketch.newHeapInstance(200)
      vals.foreach(s.update)
      (s.getN, s.getQuantile(0.5), s.getQuantile(0.9), s.getQuantile(0.99))
    }
    val s1 = scalarRef((2L to 40L by 2).map(_.toDouble))
    val s2 = scalarRef((1L to 39L by 2).map(_.toDouble))
    assert((got("s1")._2, got("s1")._3, got("s1")._4, got("s1")._5) ===
      ((s1._1, s1._2, s1._3, s1._4)))
    assert((got("s2")._2, got("s2")._3, got("s2")._4, got("s2")._5) ===
      ((s2._1, s2._2, s2._3, s2._4)))
    // segments → corpus: union of per-source sketches == one global sketch
    val merged = Corpus.lengthQuantilesFromSketches(
      Corpus.mergeLengthSketches(sk.select("sk")))
      .as[(Long, Double, Double, Double)].collect().head
    val global = scalarRef((1L to 40L).map(_.toDouble))
    assert(merged === ((global._1, global._2, global._3, global._4)))
  }

  test("llrCollocations == scalar Dunning G²; evidence outranks a rare coincidence") {
    // "of course" occurs 6× with strong evidence; "rare pair" once —
    // PMI would favor the singleton, G² must rank the evidenced pair
    val docs = Seq(
      (1L, "of course the plan works of course it does of course yes"),
      (2L, "of course the market moves of course the index follows"),
      (3L, "rare pair appears once here with other words around it"),
      (4L, "of course filler text and more filler text again now"))
      .toDF("doc_id", "text")
    val bigrams = docs.as[(Long, String)].collect().flatMap { case (_, t) =>
      t.split(" ").sliding(2).map(a => (a(0), a(1)))
    }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1s = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c2s = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = bigrams.length.toLong
    def cell(k: Long, r: Long, c: Long): Double =
      if (k > 0) k.toDouble * (math.log(k.toDouble) + math.log(n.toDouble) -
        math.log(r.toDouble) - math.log(c.toDouble))
      else 0.0
    def llr(w1: String, w2: String): Double = {
      val k11 = c12((w1, w2)); val r = c1s(w1); val c = c2s(w2)
      val raw = 2.0 * (cell(k11, r, c) + cell(r - k11, r, n - c) +
        cell(c - k11, n - r, c) + cell(n - r - c + k11, n - r, n - c))
      math.round(raw * 10000).toDouble / 10000
    }
    val truth = c12.keys.filter(p => c12(p) >= 2).toSeq
      .map { case (w1, w2) => (w1, w2, llr(w1, w2)) }
      .sortBy { case (w1, w2, s) => (-s, w1, w2) }
    val got = Corpus.llrCollocations(docs, minCount = 2L, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(g => (g._1, g._2)) === truth.take(10).map(t => (t._1, t._2)))
    got.zip(truth).foreach { case (g, t) =>
      assert(math.abs(g._6 - t._3) < 1e-9, s"${g._1} ${g._2}")
    }
    assert(got.head._1 === "of" && got.head._2 === "course",
      "the evidenced collocation must rank first")
  }

  test("bloomDecontaminate == exact decontaminate; identity survives an absurd fpp") {
    val docs = TestSpark.spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val pred = col("doc_id") % 5 === 0
    val exact = Corpus.decontaminate(docs, pred, n = 8)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty, "fixture must exercise the matcher")
    val pruned = Corpus.bloomDecontaminate(docs, pred, n = 8)
      .as[(Long, Long)].collect().toMap
    assert(pruned === exact, "lossless prune: bloom has no false negatives")
    // with fpp = 0.5 half the non-matching grams leak past the bloom —
    // the exact verify must still reduce to the identical relation
    val leaky = Corpus.bloomDecontaminate(docs, pred, n = 8, fpp = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(leaky === exact, "exact verify kills the false-positive leak")
  }

  test("theta overlap: exact regime == true shingle overlaps on a planted-syndication corpus") {
    // s1/s2 share a syndicated span (common shingles); s3 is disjoint
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "s1"),
      (2L, "alpha beta gamma delta epsilon zeta iota kappa", "s2"),
      (3L, "uno dos tres cuatro cinco seis siete ocho", "s3"))
      .toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
    def sh3(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val sets = Map(
      "s1" -> sh3("alpha beta gamma delta epsilon zeta eta theta"),
      "s2" -> sh3("alpha beta gamma delta epsilon zeta iota kappa"),
      "s3" -> sh3("uno dos tres cuatro cinco seis siete ocho"))
    val got = Corpus.thetaOverlapEstimates(
      Corpus.sourceShingleThetaSketches(docs))
      .as[(String, String, Double, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    for (((a, b), r) <- got) {
      val (sa, sb) = (sets(a), sets(b))
      val inter = sa.intersect(sb).size.toDouble
      assert(r._3 === sa.size.toDouble && r._4 === sb.size.toDouble,
        s"$a/$b set sizes exact below k")
      assert(r._5 === inter, s"$a/$b intersection exact below k")
      val jac = inter / (sa.size + sb.size - inter)
      assert(math.abs(r._6 - math.round(jac * 10000).toDouble / 10000) < 1e-9)
    }
    assert(got(("s1", "s2"))._5 > 0 && got(("s1", "s3"))._5 === 0.0)
  }

  test("theta overlap: beyond-k estimates stay inside the published error envelope") {
    // two sources of 60k distinct synthetic shingles with a planted 20k
    // overlap — far beyond k = 2^12 nominal entries
    val n = 60000; val overlap = 20000
    val rows =
      (0 until n).map(i => (i.toLong, s"a$i x$i y$i", "s1")) ++
        (0 until n).map(i => ((n + i).toLong,
          (if (i < overlap) s"a$i x$i y$i" else s"b$i v$i w$i"), "s2"))
    val docs = rows.toDF("doc_id", "text", "source")
    val got = Corpus.thetaOverlapEstimates(
      Corpus.sourceShingleThetaSketches(docs, lgK = 12))
      .as[(String, String, Double, Double, Double, Double)].collect().head
    // RSE ≈ 1/sqrt(2^12) ≈ 1.6%; intersection error compounds — allow 5×
    assert(math.abs(got._3 - n) / n < 0.08, s"est_a ${got._3}")
    assert(math.abs(got._4 - n) / n < 0.08, s"est_b ${got._4}")
    assert(math.abs(got._5 - overlap) / overlap < 0.15, s"est_inter ${got._5}")
  }

  test("lengthQuantileSketches: compaction regime keeps the KLL rank-error envelope") {
    import org.apache.datasketches.kll.KllDoublesSketch
    // 30k distinct lengths through k=200 → heavy compaction; the
    // estimate's TRUE rank must stay within the published ±2ε bound
    val n = 30000
    val docs = (1L to n.toLong).map(i =>
      (i, Seq.fill((i % 300 + 1).toInt)("w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val got = Corpus.lengthQuantilesFromSketches(
      Corpus.lengthQuantileSketches(docs, k = 200))
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(got._2 === n.toLong, "n is exact regardless of compaction")
    val sorted = (1L to n.toLong).map(i => (i % 300 + 1).toDouble).sorted
    val eps = 2.0 * org.apache.datasketches.kll.KllSketch.getNormalizedRankError(200, false)
    for ((p, est) <- Seq(0.5 -> got._3, 0.9 -> got._4, 0.99 -> got._5)) {
      val trueRank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(trueRank - p) <= eps + 1.0 / 300, // +1 value-granularity step
        s"p=$p est=$est rank=$trueRank")
    }
  }
}
