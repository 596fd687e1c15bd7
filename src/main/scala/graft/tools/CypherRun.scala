package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs an ad-hoc Cypher query against the TPC-H property graph and
  * prints the rows — the REPL-shaped surface for exploring the
  * planner without registering a query key.
  * Usage: runMain graft.tools.CypherRun <sfDir> <cypher>
  */
object CypherRun {
  def main(args: Array[String]): Unit = {
    val (sfDir, query) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftOptimizations.install(spark)
    val df = graft.cypher.CypherQueries.run(spark, sfDir, query)
    df.show(100, truncate = false)
    spark.stop()
  }
}
