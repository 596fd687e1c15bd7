package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-bucketed fact tables join with zero exchanges and exact results") {
    val orders = graft.Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = graft.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_quantity"))
    BucketedSink.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    BucketedSink.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 8)
    try {
      val joined = BucketedSink.readBucketed(spark, "b_orders")
        .join(BucketedSink.readBucketed(spark, "b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      // the bucket layout IS the hash partitioning: the join plans
      // without a single shuffle exchange
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and the rows are exactly the unbucketed join's rows
      val expected = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected && expected > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
