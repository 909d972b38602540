package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the three query modules must not shadow each
  * other's keys (Map ++ overwrites silently), every oracle key must have a
  * query, and names must follow the qNN convention. */
class RegistrySpec extends AnyFunSuite {

  test("no duplicate query keys across modules") {
    val all = Seq(
      graft.queries.CrawlQueries.entries.keys,
      graft.queries.RelationalQueries.entries.keys,
      graft.queries.PipelineQueries.entries.keys,
      graft.queries.StreamingQueries.entries.keys).flatten.toSeq
    val dupes = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate keys: $dupes")
    assert(SparkEntry.queries.size === all.size)
  }

  test("every oracle key has a matching query entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query naming convention and minimum coverage") {
    assert(SparkEntry.queries.keys.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")))
    assert(SparkEntry.queries.size >= 34)
    assert(SparkEntry.oracleSql.size >= 30)
  }
}
