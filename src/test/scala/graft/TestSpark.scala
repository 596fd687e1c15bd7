package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by all specs (forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-test-warehouse-${java.lang.ProcessHandle.current().pid()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.plans.GraftOptimizations.install(s)
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
