package graft.tools

import org.apache.spark.sql.SparkSession

/** Lists the declared queries whose optimized plan is touched by
  * [[graft.plans.EagerCountAggregation]] (contains a `__graft_cnt`
  * pre-aggregation column). Usage: `runMain graft.tools.RuleAudit
  * [sfDir]`.
  */
object RuleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftOptimizations.install(spark)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan.treeString
        if (plan.contains("__graft_cnt")) println(s"[ruleaudit] REWRITTEN $name")
      } catch { case e: Throwable =>
        println(s"[ruleaudit] ERROR $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
