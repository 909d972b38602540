package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution (SURVEY.md §2 op 137).
  *
  * A crawl accumulates an edge table of HTTP redirects (301/302/307/308:
  * src url → dst url). Before scheduling, the frontier wants every
  * redirecting url resolved to its FINAL destination — the url that
  * actually fetches — plus the hop count (clients cap chains) and a flag
  * for chains that never terminate (redirect loops, the classic
  * misconfigured-CMS trap; also chains longer than the cap, which a
  * polite client abandons identically).
  *
  * Distributed shape: POINTER DOUBLING on the jump table, the op-53
  * (connected components) technique re-applied to a functional graph.
  * `jump` starts as the 1-step edge table; each round left-joins `jump`
  * to itself on `dst == src` — an entry either extends by the target's
  * current jump (doubling its reach) or, when the target no longer
  * redirects (null join), stays at its terminal. After k rounds every
  * chain of length ≤ 2^k is fully resolved with EXACT hop counts, in
  * log2(cap) shuffled self-joins instead of cap sequential joins — at a
  * 10^10-url frontier with redirect chains capped at 16 that is 4
  * exchanges over the (small) redirecting-url subset, never the corpus.
  * A url whose final dst still appears as a redirect src after the
  * rounds sits on a cycle (or a >cap chain): status 'unresolved' —
  * exactly the give-up rule a sequential client applies at the cap.
  *
  * Determinism: for cycles both engine and oracle compute the position
  * after EXACTLY 2^rounds steps (the jump never rests once on a cycle;
  * the oracle's recursive walk is hop-capped at the same 2^rounds), so
  * final_url/hops agree even on loops. */
object Redirects {

  /** Redirect-aware frontier collapse: map every frontier url to its
    * EFFECTIVE fetch target (the redirect chain's terminal for resolved
    * redirect sources, itself otherwise) and count how many frontier
    * entries land on each — the dedup a seen-set keyed on raw urls
    * misses (an /old/ alias and its /articles/ target would both fetch).
    * Unresolved sources (loops / over-cap chains) are DROPPED — the
    * polite client abandons them, so they never reach the fetch queue.
    * One left equi-join of the (distinct) frontier against the
    * pointer-doubled jump table + one hash agg on the effective key. */
  def frontierCollapse(frontier: DataFrame, edges: DataFrame,
      rounds: Int = 4): DataFrame = {
    val res = resolve(edges, rounds)
    frontier.select(col("url")).distinct()
      .join(res.select(col("src_url").as("url"), col("final_url"), col("status")),
        Seq("url"), "left")
      .filter(coalesce(col("status"), lit("ok")) === "ok")
      .select(coalesce(col("final_url"), col("url")).as("effective_url"))
      .groupBy("effective_url").agg(count(lit(1)).as("n_entries"))
  }

  /** Resolve every redirecting url in `edges(src, dst)` to
    * (src_url, final_url, hops, status) where status ∈ {'ok',
    * 'unresolved'}; chains up to 2^rounds hops resolve exactly. */
  def resolve(edges: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 10, "rounds must be in [1,10]")
    var jump = edges.select(col("src"), col("dst"), lit(1L).as("hops"))
    for (_ <- 1 to rounds) {
      jump = jump.as("a")
        .join(jump.as("b"), col("a.dst") === col("b.src"), "left")
        .select(
          col("a.src"),
          coalesce(col("b.dst"), col("a.dst")).as("dst"),
          (col("a.hops") + coalesce(col("b.hops"), lit(0L))).as("hops"))
    }
    // status: a final dst that still redirects means loop-or-too-long —
    // a left-semi-style membership probe against the src set.
    val srcSet = edges.select(col("src").as("dst")).distinct()
      .withColumn("still_redirects", lit(true))
    jump.join(srcSet, Seq("dst"), "left")
      .select(
        col("src").as("src_url"),
        col("dst").as("final_url"),
        col("hops"),
        when(col("still_redirects").isNotNull, lit("unresolved"))
          .otherwise(lit("ok")).as("status"))
  }
}
