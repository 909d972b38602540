package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web link-graph analytics over a crawl's hyperlink edge table
  * (src page → dst page, anchor text) — the graph-side signals a
  * frontier scheduler and an indexer both consume: anchor-text
  * profiles (the classic off-page relevance signal), BFS depth from
  * the seed list (crawl-depth policy input), seed-personalized
  * PageRank (TrustRank — Gyöngyi et al. 2004 — the link-spam
  * demotion signal), and per-node degree/reciprocity stats (the
  * link-farm audit view).
  *
  * Scale shape shared by all four: every step is a shuffled equi-join
  * or hash aggregate keyed on page id — no driver-side graph, no
  * windows over raw edges (the one window in [[anchorProfiles]] runs
  * on the (dst, term) AGGREGATED grain, the op-49 discipline). At a
  * 10^10-url graph the edge table shuffles 8-byte ids + short anchor
  * strings only.
  */
object LinkGraph {

  /** Per-target anchor-text profile: for each link target, the
    * in-degree, the number of distinct incoming anchor terms, and the
    * dominant anchor term (most linking occurrences; lexicographic
    * tie-break) — the aggregated off-page description of a page that
    * fielded ranking (BM25F's anchor field) consumes.
    *
    * `edges` columns: (src, dst, anchor). Two map-side-combined hash
    * aggs — edge grain for in-degree, (dst, term) grain for counts —
    * plus one row_number window on the aggregated term grain
    * (WindowGroupLimit-sized, never the raw anchor stream) folded
    * into a final dst-grain agg. */
  def anchorProfiles(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("dst")).agg(count(lit(1)).as("in_degree"))
    val terms = edges
      .select(col("dst"), explode(split(col("anchor"), " ")).as("term"))
      .groupBy("dst", "term").agg(count(lit(1)).as("n_links"))
    val w = Window.partitionBy(col("dst")).orderBy(desc("n_links"), col("term"))
    val prof = terms
      .withColumn("rn", row_number().over(w))
      .groupBy("dst")
      .agg(
        count(lit(1)).as("n_terms"),
        max(when(col("rn") === 1, col("term"))).as("top_term"),
        max(when(col("rn") === 1, col("n_links"))).as("top_links"))
    deg.join(prof, Seq("dst"))
      .select(col("dst").as("doc_id"), col("in_degree"),
        col("n_terms"), col("top_term"), col("top_links"))
  }

  /** BFS hop distance from the seed set: (doc_id, depth) for every
    * page reachable from `seeds` within `rounds` hops (unreached pages
    * are absent — the frontier's "beyond the depth budget" cut).
    *
    * Delta iteration: each round expands ONLY the frontier discovered
    * in the previous round (never the whole reached set), so round r
    * shuffles O(|frontier_r| · avg-degree) rows; min-depth semantics
    * come free because a node already in `dist` is anti-joined away
    * before it can re-enter at a larger depth. Cycles terminate for
    * the same reason. localCheckpoint truncates the per-round lineage
    * (the op-53 CC pattern; swap in a reliable checkpointDir for
    * fault tolerance on a long-lived cluster job, as
    * [[graft.ml.Corpus.connectedComponents]] does). */
  def seedDepths(edges: DataFrame, seeds: DataFrame, rounds: Int = 6): DataFrame = {
    require(rounds >= 1 && rounds <= 32, "rounds must be in [1,32]")
    val e = edges.select(col("src"), col("dst"))
    var dist = seeds.select(col("doc_id").as("node"), lit(0).as("depth"))
      .distinct().localCheckpoint()
    var frontier = dist
    for (r <- 1 to rounds) {
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(r).as("depth"))
        .localCheckpoint()
      dist = dist.unionAll(next).localCheckpoint()
      frontier = next
    }
    dist.select(col("node").as("doc_id"), col("depth"))
  }

  /** TrustRank: PageRank personalized to a trusted seed set — the
    * teleport vector is uniform over `seeds` (and zero elsewhere)
    * instead of uniform over all nodes, so score mass flows outward
    * from vetted pages and link-farm islands that no trusted page
    * reaches score ~0. Fixed `iters` rounds, unit edge weights.
    *
    * Float discipline (the op-72 PageRank rules): (1-d) is evaluated
    * ONCE in Scala and interpolated into the oracle; the per-edge
    * term is the left-assoc rank/outdeg on both sides; only the
    * in-mass sum's addition order differs, absorbed by the 6-dp
    * output rounding. Seeds outside the graph carry no mass (the
    * teleport denominator counts seeds ∩ nodes). */
  def trustrank(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = edges.select(col("src"), col("dst"))
    val outw = e.groupBy("src").agg(count(lit(1)).cast("double").as("outw"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val seedNodes = seeds.select(col("doc_id").as("node")).distinct()
      .join(nodes, Seq("node"), "left_semi")
    val nSeeds = seedNodes.agg(count(lit(1)).cast("double").as("n_seeds"))
    val tele = nodes
      .join(seedNodes.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .crossJoin(broadcast(nSeeds))
      .select(col("node"),
        when(col("is_seed").isNotNull, lit(1.0) / col("n_seeds"))
          .otherwise(lit(0.0)).as("t"))
    val teleportMass = 1.0 - damping // Scala-evaluated; oracle interpolates
    var ranks = tele.select(col("node"), col("t").as("rank"))
    for (_ <- 1 to iters) {
      val inMass = e
        .join(outw, Seq("src"))
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("outw")).as("c"))
        .groupBy("node").agg(sum("c").as("cin"))
      ranks = tele
        .join(inMass, Seq("node"), "left")
        .select(col("node"),
          (lit(teleportMass) * col("t") +
            lit(damping) * coalesce(col("cin"), lit(0.0))).as("rank"))
    }
    ranks.select(col("node").as("doc_id"), round(col("rank"), 6).as("trust"))
  }

  /** Spam-mass estimation (Gyöngyi, Berkhin, Garcia-Molina & Pedersen,
    * "Link Spam Detection Based on Mass Estimation", VLDB'06): how much
    * of a page's PageRank arrives via paths the trusted core cannot
    * explain. Runs TWO personalized-PageRank recursions in ONE joint
    * iteration over the same edges:
    *   - `pr`: teleport uniform 1/N over ALL nodes (plain PageRank);
    *   - `tr`: teleport 1/N at the trusted seeds, 0 elsewhere (the
    *     paper's q′ — note 1/N, NOT TrustRank's 1/|S|, so tr ≤ pr holds
    *     component-wise by teleport-vector monotonicity and the
    *     relative mass (pr − tr)/pr lands in [0, 1]).
    * High relative mass ≈ rank manufactured by link structure no
    * trusted page endorses — the demotion signal.
    *
    * Plan shape: the per-round in-mass join runs ONCE and aggregates
    * BOTH columns in the same map-side-combined hash agg (half the
    * shuffles of composing [[trustrank]] with `pagerankFixed`). Float
    * discipline: q69's — (1−d) and d Scala-evaluated (oracle
    * interpolates), per-edge terms the left-assoc rank/outdeg, only the
    * in-mass sums' addition order differs (absorbed by the 6-dp round);
    * the mass ratio is one division of two already-rounded values. */
  def spamMass(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = edges.select(col("src"), col("dst"))
    val outw = e.groupBy("src").agg(count(lit(1)).cast("double").as("outw"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nCount = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    val seedNodes = seeds.select(col("doc_id").as("node")).distinct()
      .join(nodes, Seq("node"), "left_semi")
    val tele = nodes
      .join(seedNodes.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .crossJoin(broadcast(nCount))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("tp"),
        when(col("is_seed").isNotNull, lit(1.0) / col("n_nodes"))
          .otherwise(lit(0.0)).as("tt"))
    val teleportMass = 1.0 - damping // Scala-evaluated; oracle interpolates
    var ranks = tele.select(col("node"), col("tp").as("pr"), col("tt").as("tr"))
    for (_ <- 1 to iters) {
      val inMass = e
        .join(outw, Seq("src"))
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          (col("pr") / col("outw")).as("cp"), (col("tr") / col("outw")).as("ct"))
        .groupBy("node").agg(sum("cp").as("cinp"), sum("ct").as("cint"))
      ranks = tele
        .join(inMass, Seq("node"), "left")
        .select(col("node"),
          (lit(teleportMass) * col("tp") +
            lit(damping) * coalesce(col("cinp"), lit(0.0))).as("pr"),
          (lit(teleportMass) * col("tt") +
            lit(damping) * coalesce(col("cint"), lit(0.0))).as("tr"))
    }
    ranks.select(col("node").as("doc_id"),
      round(col("pr"), 6).as("pagerank"), round(col("tr"), 6).as("trusted_pr"),
      round((round(col("pr"), 6) - round(col("tr"), 6)) / round(col("pr"), 6), 6)
        .as("rel_spam_mass"))
  }

  /** Host-level link-graph rollup: page edges aggregated to the
    * (src_host, dst_host) grain, same-host navigation excluded — the
    * inter-publisher citation matrix that seeds TrustRank whitelists
    * and surfaces link farms (a host pair with an absurd one-way link
    * mass). Two 8-byte-key dim joins + one pair-grain hash agg; at a
    * 10^10-page graph the OUTPUT is host²-bounded, which is the point
    * of rolling up before any analysis. */
  def hostGraph(edges: DataFrame, hosts: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    e.join(hosts.select(col("doc_id").as("src"), col("host").as("src_host")), Seq("src"))
      .join(hosts.select(col("doc_id").as("dst"), col("host").as("dst_host")), Seq("dst"))
      .filter(col("src_host") =!= col("dst_host"))
      .groupBy("src_host", "dst_host").agg(count(lit(1)).as("n_links"))
  }

  /** Bibliographic-coupling pairs (Kessler 1963, the link-based
    * relatedness signal orthogonal to anchors/PageRank): two pages are
    * coupled iff they LINK TO ≥ `minShared` common targets — "cite the
    * same sources" relatedness, robust to pages that never link to each
    * other. Output (a, b, n_shared) with a < b.
    *
    * Shape: the self-join runs on the dst key, so each target
    * replicates by its in-degree² — `maxIndeg` drops super-connected
    * targets first (a page everyone links to carries no coupling
    * signal; the same stop-key pruning as the hard-negative maxDf and
    * the PPJoin prefix bound). Pair counts are a map-side-combined hash
    * agg on the (a, b) grain. */
  def couplingPairs(edges: DataFrame, minShared: Long = 2,
      maxIndeg: Long = Long.MaxValue): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val kept = e.join(
      e.groupBy("dst").agg(count(lit(1)).as("ind"))
        .filter(col("ind") <= maxIndeg).select("dst"),
      Seq("dst"), "left_semi")
    kept.select(col("src").as("a"), col("dst"))
      .join(kept.select(col("src").as("b"), col("dst")), Seq("dst"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
    * Preda & Cobena, WWW'03): the frontier-priority signal a crawler can
    * maintain WHILE crawling, unlike PageRank's converge-then-read. Each
    * node starts with cash 1/N; every round it distributes its whole
    * cash equally over its out-edges (dangling nodes return theirs
    * uniformly to all N — the paper's virtual-root shortcut), and banks
    * what it distributed in its history. The importance estimate after k
    * rounds is (history + cash) / (k + 1): total cash is conserved at 1
    * and history grows by exactly 1 per round, so the scores sum to 1.
    *
    * Fixed `iters` rounds keep it deterministic and oracle-unrollable
    * (the q69 PageRank discipline — the oracle replays the same per-round
    * formula; only the in-mass addition order differs and the 6-dp output
    * rounding absorbs it). Every round is two hash-keyed equi-joins plus
    * one hash agg on node ids — no driver-side graph state; the dangling
    * mass is a 1-row broadcast crossJoin (constant attach). */
  def opicFixed(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 16, "iters must be in [1,16]")
    val e = edges.select(col("src"), col("dst"))
    val outd = e.groupBy("src").agg(count(lit(1)).as("outd"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nCount = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    var state = nodes.crossJoin(broadcast(nCount))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("cash"),
        lit(0.0).as("hist"), col("n_nodes"))
    for (_ <- 1 to iters) {
      // mass arriving over edges: src's cash split equally per out-edge
      val inMass = e
        .join(outd, Seq("src"))
        .join(state.select(col("node").as("src"), col("cash")), Seq("src"))
        .select(col("dst").as("node"), (col("cash") / col("outd")).as("c"))
        .groupBy("node").agg(sum("c").as("cin"))
      // dangling nodes (no out-edges) return their cash uniformly
      val dangling = state
        .join(outd.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum("cash"), lit(0.0)).as("dmass"))
      state = state
        .join(inMass, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (coalesce(col("cin"), lit(0.0)) + col("dmass") / col("n_nodes"))
            .as("cash"),
          (col("hist") + col("cash")).as("hist"),
          col("n_nodes"))
    }
    state.select(col("node").as("doc_id"),
      round((col("hist") + col("cash")) / (iters + 1.0), 6).as("opic"))
  }

  /** Per-node degree audit: out-degree, in-degree, and the count of
    * reciprocated out-edges (dst links back to src — mutual-linking is
    * the cheapest link-farm tell). One row per node with any edge.
    * Three hash aggs + one self equi-join on (src, dst) — the
    * reciprocal probe joins the edge table to its own reversal on the
    * composite key, never a cross product. */
  def degreeStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val out = e.groupBy(col("src").as("doc_id")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("doc_id")).agg(count(lit(1)).as("in_deg"))
    val recip = e
      .join(e.select(col("dst").as("src"), col("src").as("dst")), Seq("src", "dst"), "left_semi")
      .groupBy(col("src").as("doc_id")).agg(count(lit(1)).as("n_reciprocal"))
    out.join(in, Seq("doc_id"), "full")
      .join(recip, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("n_reciprocal"), lit(0L)).as("n_reciprocal"))
  }

  /** SALSA authority scores (Lempel & Moran, WWW'00; Najork, SIGIR'07
    * measured the authority side out-ranking HITS for web retrieval) —
    * the random-walk cousin of [[graft.ml.Corpus.hitsFixed]] whose
    * stationary solution is CLOSED-FORM: on the bipartite support graph
    * (every page split into a hub copy and an authority copy, one
    * undirected bipartite edge per link), the authority weight of page i
    * in connected component A_j is (|A_j|/|A|) · (d_in(i)/Σ_{k∈A_j}
    * d_in(k)). No eigen-iteration at all — mutual reinforcement reduces
    * to within-component in-degree normalization, which is why SALSA
    * resists the tightly-knit-community effect that inflates HITS.
    *
    * Plan shape: the bipartite encoding (2·id / 2·id+1) feeds the proven
    * O(log diameter) [[graft.ml.Corpus.connectedComponents]] kernel; the
    * in-degree and per-component sums are hash aggs over 8-byte keys;
    * the |A| total is a 1-row broadcast attach. Every score input is an
    * exact integer, the final two-ratio product rounds at 6 dp. */
  def salsaAuthorities(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val bip = e.select((col("src") * 2).as("a"), (col("dst") * 2 + 1).as("b"))
    val cc = graft.ml.Corpus.connectedComponents(bip)
      .select(col("doc_id").as("enc"), col("rep"))
    val din = e.groupBy("dst").agg(count(lit(1)).as("din"))
    val auth = din.join(cc, cc("enc") === din("dst") * 2 + 1).drop("enc")
    val comp = auth.groupBy("rep")
      .agg(sum("din").as("comp_din"), count(lit(1)).as("comp_auth"))
    val total = auth.agg(count(lit(1)).cast("double").as("n_auth"))
    auth.join(comp, Seq("rep")).crossJoin(broadcast(total))
      .select(col("dst").as("doc_id"), col("rep").as("component"),
        col("din").as("d_in"),
        round((col("comp_auth").cast("double") / col("n_auth")) *
          (col("din").cast("double") / col("comp_din").cast("double")), 6)
          .as("salsa_auth"))
  }
}
