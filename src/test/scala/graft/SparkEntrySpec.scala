package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the smoke entry returns rows, every oracle
  * key has a query, and names are unique across registries.
  */
class SparkEntrySpec extends AnyFunSuite with SparkSpec {

  test("entry() flagship returns rows at sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("registry sizes: 117 queries, 116 with oracles") {
    assert(SparkEntry.queries.size === 117)
    assert(SparkEntry.oracleSql.size === 116)
    // a09's HLL++ sketch is the single rows-only entry by design (engine-
    // specific sketch; error bound pinned in PipelineOpsSpec instead)
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ===
      Set("a09_approx_distinct"))
  }
}
