package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the formatted physical plan and wall
  * time for one SparkEntry query (or all). Usage:
  *
  *   runMain graft.tools.PlanAudit <queryName|all> [sfDir] [--explain]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets =
      if (name == "all") SparkEntry.queries.toSeq.sortBy(_._1)
      else Seq(name -> SparkEntry.queries(name))
    targets.foreach { case (n, fn) =>
      val df = fn(spark, sfDir)
      if (doExplain) {
        println(s"===== $n =====")
        df.explain("formatted")
      }
      val t0 = System.nanoTime()
      val rows = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[audit] $n%-28s rows=$rows%-8d ${dt}%8.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
