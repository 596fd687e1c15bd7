package graft.tools

import org.apache.spark.sql.SparkSession

/** Spot-runs a comma-separated list of declared queries at a given SF
  * dir, best-of-`reps`, and prints one JSON line per query — the
  * builder's harness for the sf1/sf10 scale-evidence artifacts.
  * Usage: runMain graft.tools.ScaleSpot <sfDir> <q1,q2,…> [reps]
  */
object ScaleSpot {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftOptimizations.install(spark)
    def dropCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!graft.Artifacts.isPinned(id)) rdd.unpersist(false)
      }
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch {
          case e: Throwable =>
            System.err.println(s"[scalespot] $name failed: $e"); -1L
        }
        dropCaches()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.map(_._1).min
      println(f"""{"query":"$name","best_sec":$best%.3f,"rows":${times.head._2},"reps":$reps}""")
    }
    spark.stop()
  }
}
