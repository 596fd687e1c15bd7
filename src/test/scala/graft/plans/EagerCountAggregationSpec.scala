package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EagerCountAggregationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRule[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.eagerCountAgg", on.toString)
    try f finally spark.conf.set("spark.graft.eagerCountAgg", "true")
  }

  test("count-over-join rewrites to pre-aggregated sums and matches the direct plan") {
    import spark.implicits._
    // many-to-many on k, null keys and null count-args included:
    // nulls never join; count(v) must skip null v
    val l = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c"),
      (3, "x")).toDF("k", "lv")
      .union(Seq((null.asInstanceOf[Integer], "n")).toDF("k", "lv"))
    val r = Seq((1, "p"), (1, "q"), (2, "p"), (4, "z")).toDF("k", "rv")
      .union(Seq((2, null.asInstanceOf[String])).toDF("k", "rv"))
      .union(Seq((null.asInstanceOf[Integer], "n")).toDF("k", "rv"))
    def query() = l.join(r, "k")
      .groupBy(col("lv"))
      .agg(count(lit(1)).as("pairs"), count(col("rv")).as("rvs"))
      .orderBy(col("lv"))
    val direct = withRule(on = false)(query().collect().toSeq)
    val rewritten = withRule(on = true) {
      val df = query()
      assert(df.queryExecution.optimizedPlan.treeString.contains("__graft_cnt"),
        "rule did not fire on a count-over-join")
      df.collect().toSeq
    }
    assert(rewritten == direct)
    // sanity against hand arithmetic: lv=a joins k=1 (2 r-rows) and
    // k=2 (2 r-rows incl. one null rv)
    assert(direct.find(_.getString(0) == "a").get.getLong(1) == 4L)
    assert(direct.find(_.getString(0) == "a").get.getLong(2) == 3L)
  }

  test("multi-MATCH counting query pre-aggregates below every join") {
    val df = graft.cypher.CypherQueries.multiMatch(spark, TestSpark.sf)
    val plan = df.queryExecution.optimizedPlan.treeString
    assert(plan.contains("__graft_cnt"), "eager count aggregation did not fire")
    // the rewrite cascades: the 4-join tree pre-aggregates at several
    // levels, not just under the top aggregate
    val preAggs = "__graft_cnt#".r.findAllIn(plan).size
    assert(preAggs >= 8, s"expected a cascaded rewrite, saw $preAggs pre-agg refs")
  }

  test("ineligible shapes are untouched: distinct, non-count, outer joins") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val r = Seq((1, 10), (1, 20)).toDF("k", "x")
    val distinctPlan = l.join(r, "k").groupBy(col("lv"))
      .agg(countDistinct(col("x"))).queryExecution.optimizedPlan.treeString
    assert(!distinctPlan.contains("__graft_cnt"))
    val sumPlan = l.join(r, "k").groupBy(col("lv"))
      .agg(sum(col("x"))).queryExecution.optimizedPlan.treeString
    assert(!sumPlan.contains("__graft_cnt"))
    val outerPlan = l.join(r, Seq("k"), "left")
      .groupBy(col("lv")).agg(count(lit(1)))
      .queryExecution.optimizedPlan.treeString
    assert(!outerPlan.contains("__graft_cnt"))
  }

  test("streaming aggregates are untouched (state placement is not batch-algebraic)") {
    // the rewrite's identity count = Σ cl·cr holds per-plan-execution;
    // a streaming aggregate re-executes the subtree per micro-batch
    // with CROSS-BATCH state, so splitting it double-counts prior
    // batches (the lpaVotes regression: votes 1 → 3 instead of 1 → 2)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "dv")
    val agg = input.toDF().toDF("k", "v").join(dim, "k")
      .groupBy(col("dv")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("eca_stream")
      .outputMode("update").start()
    try {
      input.addData((1L, 1L)); q.processAllAvailable()
      input.addData((1L, 2L)); q.processAllAvailable()
      val counts = spark.table("eca_stream").collect()
        .filter(_.getString(0) == "a").map(_.getLong(1))
      // cross-batch count must reach exactly 2 (1 would mean the
      // state reset; 3 would mean the split re-added batch 1)
      assert(counts.max == 2L, s"streaming count corrupted: ${counts.toSeq}")
      // and the LAST EXECUTED micro-batch plan must not carry the
      // rewrite marker — assert on the IncrementalExecution's actual
      // optimized plan, not on progress metadata
      val lastExec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution
      assert(lastExec != null, "no micro-batch executed")
      val microBatchPlan = lastExec.optimizedPlan.treeString
      assert(microBatchPlan.contains("StateStore") ||
        lastExec.executedPlan.treeString.contains("StateStore"),
        "micro-batch plan is not the stateful aggregate under test")
      assert(!microBatchPlan.contains("__graft_cnt"),
        s"eager-count rewrite fired inside a streaming micro-batch:\n$microBatchPlan")
    } finally q.stop()
  }
}
