package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the ANN tuning curve + recall@k rows at a given SF dir —
  * the recall_at_scale evidence extractor (values, not timings).
  * Usage: runMain graft.tools.ProbeRecall <sfDir>
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Similarity.annTuning(spark, sfDir).collect().foreach { r =>
      println(s"""{"kind":"tuning","planes":${r.getLong(0)},""" +
        s""""hamming":${r.getLong(1)},"mean_recall":${r.getDouble(2)},""" +
        s""""candidates":${r.getLong(3)}}""")
    }
    graft.operators.Similarity.recallEval(spark, sfDir).collect().foreach { r =>
      println(s"""{"kind":"recall_eval","q_id":${r.getLong(0)},""" +
        s""""recall_at_10":${r.getDouble(2)}}""")
    }
    spark.stop()
  }
}
