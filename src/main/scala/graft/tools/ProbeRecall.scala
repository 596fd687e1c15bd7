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
    // IVF-family operating points vs the exact top-k
    val exact = graft.operators.Similarity.topkBruteforce(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame, kind: String): Unit = {
      val got = df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = math.rint(exact.count(got.contains).toDouble / exact.size * 1000) / 1000
      println(s"""{"kind":"$kind","mean_recall":$rec}""")
    }
    recallOf(graft.operators.Similarity.annIvf(spark, sfDir), "ivf_nprobe2")
    recallOf(graft.operators.Similarity.annIvfPq(spark, sfDir),
      "ivfpq_nprobe2_cb8_cand50")
    // scale-appropriate PQ dials: 32-cell codebooks (20 bits total)
    // and a 1000-candidate shortlist — the operating point a corpus
    // this size actually runs
    recallOf(graft.operators.Similarity.annIvfPq(spark, sfDir,
      cb = 32, cand = 1000), "ivfpq_nprobe2_cb32_cand1000")
    // finer subspaces (8 dims each) — the capacity dial that matters
    // on clustered corpora, where coarse 16-dim subquantizers blur
    // intra-cluster structure
    recallOf(graft.operators.Similarity.annIvfPq(spark, sfDir,
      m = 8, cb = 32, cand = 1000), "ivfpq_m8_cb32_cand1000")
    recallOf(graft.operators.Similarity.annIvfPq(spark, sfDir,
      m = 8, cb = 32, cand = 5000), "ivfpq_m8_cb32_cand5000")
    graft.operators.Similarity.ivfTuning(spark, sfDir).collect().foreach { r =>
      println(s"""{"kind":"ivf_tuning","nprobe":${r.getLong(0)},""" +
        s""""mean_recall":${r.getDouble(1)},"candidates":${r.getLong(2)}}""")
    }
    spark.stop()
  }
}
