package graft.core

/** Frozen per-host fixture constants.
  *
  * FIXTURES.md B3/B4/B5 derive per-host weight / politeness budget /
  * crawl_delay / parser family from Spark's `xxhash64` (seed 42). DuckDB (the
  * driver's oracle) cannot reproduce Spark's xxhash64, and the pure-Scala
  * sequential oracle should not depend on Spark at all — so the derived
  * values are FROZEN here as literals.
  *
  * Single-source-of-truth guarantee: `FixtureConstantsSpec` recomputes every
  * row with Spark's own `xxhash64` Column and asserts equality, so these
  * literals can never silently drift from the in-engine derivation.
  *
  * Columns: (source, family, weight, budget, crawl_delay, xxhash64(host)).
  */
object FixtureConstants {
  final case class HostConst(
      source: String,
      family: Int,
      weight: Double,
      budget: Int,
      crawlDelay: Double,
      hostHash: Long) {
    def host: String = source + ".example.com"
  }

  /** family = pmod(xxhash64(source), 6); weight = 1 + pmod(xxhash64(host), 10);
    * budget = 2 + pmod(xxhash64(host), 4); crawl_delay = 1 + pmod(xxhash64(host), 3).
    * (Round 2 widened the family space from 3 to 6 parser families — JSON-LD,
    * segmented-body, and entity-encoded markup joined the original three.)
    */
  val hosts: Seq[HostConst] = Seq(
    HostConst("src0", 0, 4.0, 3, 3.0, -3711722001945786967L),
    HostConst("src1", 3, 2.0, 5, 1.0, -6242559601910381229L),
    HostConst("src2", 5, 4.0, 3, 1.0, -1524357938886365067L),
    HostConst("src3", 3, 1.0, 4, 3.0, -2331037219307216350L),
    HostConst("src4", 3, 5.0, 4, 3.0, 6865694656156600754L),
    HostConst("src5", 0, 4.0, 5, 1.0, -4453366105092972537L),
    HostConst("src6", 5, 2.0, 5, 1.0, 6637558258574840811L),
    HostConst("src7", 4, 9.0, 4, 1.0, -6323151572299404582L),
    HostConst("src8", 5, 4.0, 5, 1.0, -1279165551706063557L),
    HostConst("src9", 2, 1.0, 4, 1.0, -9149990330354415150L),
    HostConst("src10", 0, 10.0, 3, 1.0, 3818926098124392009L),
    HostConst("src11", 3, 5.0, 2, 3.0, -8118059585009811916L),
    HostConst("src12", 5, 9.0, 4, 2.0, 2516517789458319958L),
    HostConst("src13", 1, 7.0, 2, 2.0, -396141621209837804L),
    HostConst("src14", 4, 9.0, 2, 1.0, 4919590549049992728L),
    HostConst("src15", 0, 1.0, 2, 2.0, -5688952616118115880L),
    HostConst("src16", 2, 6.0, 3, 1.0, 7968500199065972085L),
    HostConst("src17", 5, 5.0, 2, 2.0, -4370041166000384216L),
    HostConst("src18", 3, 10.0, 5, 3.0, -5340446964246891601L),
    HostConst("src19", 5, 9.0, 2, 1.0, 8838968552911678368L)
  )

  val bySource: Map[String, HostConst] = hosts.map(h => h.source -> h).toMap
  val byHost: Map[String, HostConst] = hosts.map(h => h.host -> h).toMap

  def familyOf(host: String): Int = byHost.get(host).map(_.family).getOrElse(0)

  /** FIXTURES.md B3: every host disallows /private/; src13 additionally
    * disallows /articles/ (one fully-blocked publisher). */
  def disallowOf(host: String): Seq[String] =
    if (host == "src13.example.com") Seq("/private/", "/articles/")
    else Seq("/private/")

  /** SQL literal `(VALUES ...) AS t(host, weight, budget, crawl_delay, family)`
    * body for embedding the frozen constants in DuckDB oracle queries. */
  def sqlValues: String =
    hosts
      .map(h => s"('${h.host}', ${h.weight}, ${h.budget}, ${h.crawlDelay}, ${h.family})")
      .mkString(", ")
}
