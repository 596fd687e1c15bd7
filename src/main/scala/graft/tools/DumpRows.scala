package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints a declared query's RESULT ROWS as one JSON line — for
  * scale-evidence artifacts whose payload is the output itself (tuning
  * curves, recall grids), not the wall-clock.
  * Usage: runMain graft.tools.DumpRows <sfDir> <query>
  */
object DumpRows {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftOptimizations.install(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val json = df.toJSON.collect().mkString("[", ",", "]")
    println(s"""{"query":"$name","rows":$json}""")
    spark.stop()
  }
}
