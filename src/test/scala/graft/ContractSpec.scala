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

  /** SURVEY §2 is the judge checklist — a declared query missing from
    * its tables (or a table row with no query behind it) is contract
    * drift, which round 7 shipped three of. Parse the §2.1–§2.3 table
    * keys and pin set equality against `SparkEntry.queries`, minus
    * the §2.4 plumbing rows (spec-covered, no oracle query by
    * design).
    */
  test("SURVEY §2 table keys match the declared query set exactly") {
    val survey = scala.io.Source.fromFile("SURVEY.md")(scala.io.Codec.UTF8)
    val lines = try survey.getLines().toVector finally survey.close()
    val start = lines.indexWhere(_.startsWith("## §2 "))
    val end = lines.indexWhere(_.startsWith("### §2.4"))
    val keyRe = """^\|\s*[^|]*\|\s*`([a-z0-9_]+)`\s*\|""".r
    val surveyKeys = lines.slice(start, end)
      .flatMap(l => keyRe.findFirstMatchIn(l).map(_.group(1))).toSet
    val declared = SparkEntry.queries.keySet
    val undeclared = surveyKeys -- declared
    val undocumented = declared -- surveyKeys
    assert(undeclared.isEmpty, s"SURVEY rows with no query: $undeclared")
    assert(undocumented.isEmpty, s"queries missing a SURVEY row: $undocumented")
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
