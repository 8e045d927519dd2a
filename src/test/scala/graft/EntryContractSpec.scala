package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract meta-pins. The correctness gate only hash-checks
  * entries that appear in BOTH `SparkEntry.queries` and
  * `SparkEntry.oracleSql`; a new entry missing its oracle would
  * silently degrade to the driver's weaker rows-only check and still
  * look green. This spec makes that degradation un-shippable. */
class EntryContractSpec extends AnyFunSuite {

  test("every catalog query has a DuckDB oracle, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle (rows-only check!): ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty,
      s"oracles without a query (dead SQL): ${(o -- q).toSeq.sorted}")
  }

  test("catalog keys are well-formed and the flagship entry exists") {
    val pat = "^q\\d+[a-z0-9_]*$".r
    val bad = SparkEntry.queries.keySet.filterNot(k => pat.matches(k))
    assert(bad.isEmpty, s"malformed query keys: $bad")
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty),
      "empty oracle SQL would pass JSON plumbing and fail only in DuckDB")
  }
}
