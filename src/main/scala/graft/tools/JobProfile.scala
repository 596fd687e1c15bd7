package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task profile: how many Spark jobs a query
  * submits, how many stages and tasks they expand to, and how wall
  * time splits between plan construction (the `fn(spark, sfDir)`
  * call) and execution (`count()`). Iterative operators are
  * job-count-bound at bench scale — this is the tool that shows it.
  *
  * Usage: runMain graft.tools.JobProfile <q1,q2,...> [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("graph_pagerank")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftOptimizations.install(spark)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val verbose = sys.env.get("JOBPROFILE_STAGES").contains("1")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        if (verbose) {
          val i = s.stageInfo
          val dur = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
          stageRows.add(f"    stage ${i.stageId}%4d ${dur.getOrElse(-1L)}%6d ms " +
            f"tasks=${i.numTasks}%4d  ${i.name.takeWhile(_ != '\n').take(90)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
    }
    def codegenStats(): (Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
    }
    spark.sparkContext.addSparkListener(listener)

    // warm once (JIT/codegen) at the tiny SF like Bench does
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    def dropCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!graft.Artifacts.isPinned(id)) rdd.unpersist(false)
      }
    }
    dropCaches()
    names.foreach { n =>
      (1 to reps).foreach { r =>
        System.gc()
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L
        val cg0 = codegenStats()
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val tPlan = System.nanoTime()
        val rows = df.count()
        val tExec = System.nanoTime()
        val cg1 = codegenStats()
        // listener bus is async: give it a beat to drain before
        // reading counters (private API would drain exactly)
        Thread.sleep(300)
        println(f"[jobprofile] $n%-28s rep $r wall=${(tExec - t0) / 1e9}%6.2fs " +
          f"plan=${(tPlan - t0) / 1e9}%5.2fs exec=${(tExec - tPlan) / 1e9}%6.2fs " +
          f"jobs=$jobs%3d stages=$stages%3d tasks=$tasks%5d taskTime=${taskMs / 1e3}%7.1fs " +
          f"cgN=${cg1._1 - cg0._1}%3d rows=$rows")
        if (verbose && r == reps) {
          stageRows.forEach(s => println(s))
        }
        stageRows.clear()
        dropCaches()
      }
    }
    spark.stop()
  }
}
