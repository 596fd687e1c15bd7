package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-broadcast rule for provably-1-row cross-join sides: an
  * UNHINTED `crossJoin(globalAgg)` must never plan a
  * CartesianProduct once GraftOptimizations is installed (TestSpark
  * installs it, like every production session).
  */
class BroadcastScalarCrossJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("unhinted crossJoin against a global aggregate broadcasts") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    val scalar = big.agg(sum(col("v")).as("total"))
    val joined = big.crossJoin(scalar) // NO manual broadcast hint
      .select(col("id"), (col("v") / col("total")).as("share"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"1-row aggregate side must broadcast, got:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"))
    // values unchanged: shares sum to 1
    val s = joined.agg(sum(col("share"))).collect().head.getDouble(0)
    assert(math.abs(s - 1.0) < 1e-9)
  }

  test("limit-1 and projected/filtered scalar frames also qualify") {
    import spark.implicits._
    val big = (1 to 2000).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    val one = big.orderBy(col("id").desc).limit(1)
      .select(col("id").as("max_id"))
    val plan = big.crossJoin(one).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val viaFilter = big.agg(count(lit(1)).as("n")).filter(col("n") > 0)
    val plan2 = big.crossJoin(viaFilter).queryExecution.executedPlan.toString
    assert(!plan2.contains("CartesianProduct"), plan2)
  }

  test("keyed joins and multi-row sides are left alone") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i % 10, i)).toDF("k", "va")
    val b = (1 to 100).map(i => (i % 10, i)).toDF("k", "vb")
    // a keyed join keeps its keyed strategy (no nested loop)
    val keyed = a.join(b, "k").queryExecution.executedPlan.toString
    assert(!keyed.contains("BroadcastNestedLoopJoin"))
    // a grouped (multi-row) aggregate side is outside the rule's
    // provably-1-row gate: applying the rule directly sets no hint
    val grouped = b.groupBy(col("k")).agg(sum(col("vb")).as("s"))
    val analyzed = a.crossJoin(grouped).queryExecution.analyzed
    val hinted = BroadcastScalarCrossJoin.apply(analyzed)
      .collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.hint.leftHint.isDefined || j.hint.rightHint.isDefined => j }
    assert(hinted.isEmpty)
    assert(a.crossJoin(grouped).count() == 1000)
  }
}
