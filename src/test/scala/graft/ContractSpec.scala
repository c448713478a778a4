package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the correctness gate is only as wide as
  * the oracle map, so a query added without an oracle silently gets the
  * weaker rows-only check — this spec makes that a test failure
  * instead. (Non-SQL-expressible operators are covered by ScalaTest
  * specs AND still carry result-shaped oracles here by design.)
  */
class ContractSpec extends AnyFunSuite {

  test("every query has a DuckDB oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across operator files (no silent map overwrites)") {
    val maps = Seq(
      graft.operators.RelationalQueries.queries, graft.operators.TextQueries.queries,
      graft.operators.DedupQueries.queries, graft.operators.VectorQueries.queries,
      graft.operators.PipelineQueries.queries, graft.operators.AnnQueries.queries,
      graft.operators.MultimodalQueries.queries, graft.operators.CurationQueries.queries,
      graft.operators.SketchQueries.queries, graft.operators.DriftQueries.queries,
      graft.operators.SourceQueries.queries, graft.operators.EditDistanceQueries.queries,
      graft.operators.GovernanceQueries.queries)
    val all = maps.flatMap(_.keys)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dupes.isEmpty, s"duplicate query names across files: $dupes")
    assert(all.size == SparkEntry.queries.size)
  }
}
