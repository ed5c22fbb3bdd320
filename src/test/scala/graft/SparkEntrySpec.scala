package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: every declared query must carry its DuckDB
  * oracle (a missing oracle silently downgrades that row to the driver's
  * weaker rows-only check), no oracle may dangle without a query, and no
  * two modules may claim the same name (Map.toMap would silently keep the
  * later module's entry and the oracle could gate the WRONG query). */
class SparkEntrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"dangling oracles: ${(o -- q).toSeq.sorted}")
  }

  test("no query or oracle name is claimed by two modules") {
    // Iterates SparkEntry's OWN module list (r9 advice): a module added to
    // SparkEntry.modules is automatically covered here; a hardcoded copy
    // would let it escape the duplicate-name guard this test exists for.
    val modules = SparkEntry.modules
    val dupQ = modules.flatMap(_.defs.keys).groupBy(identity)
      .collect { case (k, v) if v.size > 1 => k }
    val dupO = modules.flatMap(_.oracles.keys).groupBy(identity)
      .collect { case (k, v) if v.size > 1 => k }
    assert(dupQ.isEmpty, s"query names in two modules: $dupQ")
    assert(dupO.isEmpty, s"oracle names in two modules: $dupO")
  }
}
