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

  /** Every declared query must at least parse and plan — Verify
    * tolerates per-query failures (one broken query must not zero the
    * whole round), so without this pin a query that throws at plan
    * time silently drops out of the correctness gate (this is exactly
    * how the round-5 UNION parser regression shipped unnoticed).
    * Resolving the schema forces parsing, analysis, and planner
    * validation but executes nothing, so the sweep stays cheap.
    */
  test("every declared query plans against the smoke dataset") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(TestSpark.spark, TestSpark.sf).schema; None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(broken.isEmpty, s"queries failing at plan time:\n${broken.mkString("\n")}")
  }
}
