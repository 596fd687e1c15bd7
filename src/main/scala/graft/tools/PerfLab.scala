package graft.tools

import graft.graph.{Algorithms, GraphLoader}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf harness: times one named operator repeatedly so plan
  * changes can be compared without a full Bench run.
  * Usage: runMain graft.tools.PerfLab <query> [reps]
  */
object PerfLab {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("pagerank")
    val reps = if (args.length > 1) args(1).toInt else 3
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
    // warm
    graft.Tables.orders(spark, sfDir).count()
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = what match {
        case "pagerank" => Algorithms.pageRankQuery(spark, sfDir).count()
        case "pagerank_s1" | "pagerank_s3" | "pagerank_lazy" | "pagerank_s3lazy" =>
          // checkpoint-policy variants for the stride/eagerness choice
          val g = graft.graph.GraphLoader.tpch(spark, sfDir)
          val edges = Seq("PLACED_BY", "FROM_NATION", "IN_REGION")
            .map(t => g.relTable(t).select(col("__src").as("src"), col("__dst").as("dst")))
            .reduce(_.unionByName(_))
          val (stride, eager) = what match {
            case "pagerank_s1"     => (1, true)
            case "pagerank_s3"     => (3, true)
            case "pagerank_lazy"   => (2, false)
            case _                 => (3, false)
          }
          Algorithms.pageRank(spark, edges, iterations = 10,
            checkpointStride = stride, eagerCheckpoint = eager).count()
        case "cc"       => Algorithms.connectedComponentsQuery(spark, sfDir).count()
        // hits checkpoint-stride variants for the sf10 scale-drift
        // adjudication (graph_hits: 22.4× → 28.7× across r9→r10)
        case "hits_s1" | "hits_s2" | "hits_s4" | "hits_s8" =>
          val g = graft.graph.GraphLoader.tpch(spark, sfDir)
          val edges = Seq("PLACED_BY", "FROM_NATION", "IN_REGION")
            .map(t => g.relTable(t).select(col("__src").as("src"), col("__dst").as("dst")))
            .reduce(_.unionByName(_))
          Algorithms.hits(spark, edges,
            checkpointStride = what.stripPrefix("hits_s").toInt).count()
        case "latency" =>
          // fixed-cost floor: 20 trivial 1-stage jobs + 20 tiny-shuffle
          // 2-stage jobs — the per-job/per-stage scheduling overhead
          // every iterative operator pays per materialization
          val t1 = System.nanoTime()
          (1 to 20).foreach(_ => spark.range(100).count())
          val t2 = System.nanoTime()
          (1 to 20).foreach(_ =>
            spark.range(100).groupBy(col("id") % 7).count().count())
          val t3 = System.nanoTime()
          println(f"[perflab] 1-stage job: ${(t2 - t1) / 20 / 1e6}%.1f ms, " +
            f"2-stage shuffle job: ${(t3 - t2) / 20 / 1e6}%.1f ms")
          0L
        case "aa_card" =>
          // cardinalities feeding adamic_adar: edge count, degree
          // histogram, pair count
          val g = graft.graph.GraphLoader.tpch(spark, sfDir)
          val e = g.relTable("SUPPLIES")
            .select(col("__src").as("supp"), col("__dst").as("part")).distinct()
            .localCheckpoint(true)
          println(s"[perflab] edges=${e.count()}")
          val pd = e.groupBy(col("part")).agg(count(lit(1)).as("pdeg"))
          pd.groupBy(col("pdeg")).count().orderBy(col("pdeg")).show(50)
          val pairs = e.as("a").join(e.select(col("part"), col("supp").as("supp_b")).as("b"),
            col("a.part") === col("b.part") && col("a.supp") < col("supp_b"))
          println(s"[perflab] pairs=${pairs.count()}")
          0L
        case "aa_par" =>
          // the pair-enumeration stage parallelized: checkpoint e at
          // the session's shuffle parallelism instead of the
          // AQE-coalesced 4 partitions
          val g = graft.graph.GraphLoader.tpch(spark, sfDir)
          val npart = spark.conf.get("spark.sql.shuffle.partitions").toInt
          val e = g.relTable("SUPPLIES")
            .select(col("__src").as("supp"), col("__dst").as("part")).distinct()
            .repartition(npart, col("part"))
            .localCheckpoint(true)
          val pairs = e.as("a").join(e.select(col("part"), col("supp").as("supp_b")).as("b"),
            col("a.part") === col("b.part") && col("a.supp") < col("supp_b"))
            .groupBy(col("a.supp").as("supp_a"), col("supp_b"))
            .agg(count(lit(1)).as("common"))
          pairs.count()
        case "reset_check" =>
          // artifact-reset diagnosis: build the cluster artifact,
          // resetSession, re-run — the second timing must pay the
          // full rebuild (and must not throw on a dead frame)
          val ta = System.nanoTime()
          val n1 = graft.operators.Dedup.dedupClusters(spark, sfDir).count()
          val tb = System.nanoTime()
          graft.Artifacts.resetSession(spark)
          val tc = System.nanoTime()
          val n2 = graft.operators.Dedup.dedupClusters(spark, sfDir).count()
          val td = System.nanoTime()
          println(f"[perflab] build1=${(tb - ta) / 1e9}%.2fs reset=${(tc - tb) / 1e9}%.2fs " +
            f"build2=${(td - tc) / 1e9}%.2fs rows=$n1/$n2 " +
            s"persisted=${spark.sparkContext.getPersistentRDDs.size}")
          n2
        case "latency2" =>
          // decompose the trivial-job floor: raw RDD job (scheduler
          // only), SQL planning only, SQL count
          val t1 = System.nanoTime()
          (1 to 20).foreach(_ => spark.sparkContext.parallelize(1 to 100, 1).count())
          val t2 = System.nanoTime()
          (1 to 20).foreach(_ => spark.range(100).queryExecution.executedPlan)
          val t3 = System.nanoTime()
          (1 to 20).foreach(_ => spark.range(100).count())
          val t4 = System.nanoTime()
          println(f"[perflab] rdd job: ${(t2 - t1) / 20 / 1e6}%.1f ms, " +
            f"sql plan-only: ${(t3 - t2) / 20 / 1e6}%.1f ms, " +
            f"sql count: ${(t4 - t3) / 20 / 1e6}%.1f ms")
          0L
        case "hits_noaqe" =>
          // diagnosis only: how much of the per-stage cost is AQE
          // stage-materialization overhead (never shipped — AQE stays
          // on; see OPTIMIZATION_r18.md)
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          try {
            val g = graft.graph.GraphLoader.tpch(spark, sfDir)
            val edges = Seq("PLACED_BY", "FROM_NATION", "IN_REGION")
              .map(t => g.relTable(t).select(col("__src").as("src"), col("__dst").as("dst")))
              .reduce(_.unionByName(_))
            Algorithms.hits(spark, edges).count()
          } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
        case "ngram"    => graft.operators.Dedup.ngramJaccard(spark, sfDir).count()
        case "neighbor_sim"   => Algorithms.neighborSimQuery(spark, sfDir).count()
        case "dedup_clusters" => graft.operators.Dedup.dedupClusters(spark, sfDir).count()
        case "copurchase"     => graft.operators.Relational.copurchase(spark, sfDir).count()
        case "cc-after-warm" =>
          // reproduce the Bench context: tiny-SF warmup of all queries,
          // then the timed CC run
          if (r == 1) {
            graft.SparkEntry.queries.values.foreach(fn =>
              try fn(spark, "/root/testdata/sf0.001").count()
              catch { case _: Throwable => () })
            spark.sharedState.cacheManager.clearCache()
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          }
          val t1 = System.nanoTime()
          val c = Algorithms.connectedComponentsQuery(spark, sfDir).count()
          println(f"[perflab] cc-only: ${(System.nanoTime() - t1) / 1e9}%.2f s")
          c
        case "explain-pagerank" =>
          val g = GraphLoader.tpch(spark, sfDir)
          val edges = Seq("PLACED_BY", "FROM_NATION", "IN_REGION")
            .map(t => g.relTable(t).select(col("__src").as("src"), col("__dst").as("dst")))
            .reduce(_.unionByName(_))
          Algorithms.pageRank(spark, edges, 2).explain("formatted"); 0L
        // `explain:<query>` dumps the optimized logical + physical plan
        case s if s.startsWith("explain:") =>
          val df = graft.SparkEntry.queries(s.stripPrefix("explain:"))(spark, sfDir)
          println(df.queryExecution.optimizedPlan.treeString)
          df.explain("formatted"); 0L
        // any declared query by name
        case other => graft.SparkEntry.queries(other)(spark, sfDir).count()
      }
      println(f"[perflab] $what rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.sharedState.cacheManager.clearCache()
      // skip pinned artifacts — an unpersisted localCheckpoint cannot
      // recompute (same rule as Bench)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!graft.Artifacts.isPinned(id)) rdd.unpersist(false)
      }
    }
    spark.stop()
  }
}
