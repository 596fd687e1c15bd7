package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract: the inventory in SURVEY §2 is only as
  * strong as its weakest check, so EVERY declared query must carry a
  * DuckDB oracle (a rows-only entry would silently weaken the gate),
  * and the flagship entry must return rows on the smoke dataset.
  */
class ContractSpec extends AnyFunSuite {

  test("every declared query carries a SQL oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a query: $orphaned")
  }

  test("flagship entry returns rows on the smoke dataset") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
