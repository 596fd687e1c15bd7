package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for empirical large-SF validation: replicates
  * the TPC-H-ish tables `factor`× with foreign-key-consistent key
  * offsets, and synthesizes fresh documents/embeddings (rather than
  * replicating them — textual replicas would be near-duplicates of
  * each other, quadratically inflating every near-dup operator's
  * OUTPUT and measuring pair-explosion instead of engine scaling).
  *
  * Usage: `runMain graft.tools.ScaleGen <srcSfDir> <outDir> <factor>`
  * — e.g. sf0.1 × 10 ≈ sf1 (6M lineitem).
  *
  * Everything is deterministic (LCG on the row id), so reruns produce
  * byte-identical corpora.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, factor)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // key strides: one past the max so replica key ranges never overlap
    def stride(t: String, k: String): Long =
      read(t).agg(max(col(k))).head().getLong(0) + 1L

    val custStride  = stride("customer", "c_custkey")
    val suppStride  = stride("supplier", "s_suppkey")
    val partStride  = stride("part", "p_partkey")
    val orderStride = stride("orders", "o_orderkey")

    // dimension tables keep their natural size at every SF
    write(read("region"), "region")
    write(read("nation"), "nation")

    /** `factor` copies with the named key columns shifted per replica. */
    def replicate(t: String, shifts: Map[String, Long]): DataFrame = {
      val base = read(t)
      val reps = spark.range(factor).toDF("__rep")
      base.crossJoin(broadcast(reps))
        .select(base.columns.toSeq.map { c =>
          shifts.get(c) match {
            case Some(s) => (col(c) + col("__rep") * s).as(c)
            case None    => col(c)
          }
        }: _*)
    }

    write(replicate("customer", Map("c_custkey" -> custStride)), "customer")
    write(replicate("supplier", Map("s_suppkey" -> suppStride)), "supplier")
    write(replicate("part", Map("p_partkey" -> partStride)), "part")
    write(replicate("orders",
      Map("o_orderkey" -> orderStride, "o_custkey" -> custStride)), "orders")
    write(replicate("lineitem",
      Map("l_orderkey" -> orderStride, "l_partkey" -> partStride,
        "l_suppkey" -> suppStride)), "lineitem")

    // events: same time range, factor× the users and events — windows
    // get denser (the realistic direction for a busier product).
    // Read through Tables.events (TIMESTAMP(NANOS) handling); the
    // scaled copy is written back as a plain micros timestamp, which
    // Tables.events passes through untouched.
    val eventsSrc = graft.Tables.events(spark, src)
    val eventStride = eventsSrc.agg(max(col("event_id"))).head().getLong(0) + 1L
    val userStride  = eventsSrc.agg(max(col("user_id"))).head().getLong(0) + 1L
    val reps = spark.range(factor).toDF("__rep")
    write(eventsSrc.crossJoin(broadcast(reps))
      .select(eventsSrc.columns.toSeq.map {
        case c @ "event_id" => (col(c) + col("__rep") * eventStride).as(c)
        case c @ "user_id"  => (col(c) + col("__rep") * userStride).as(c)
        case c              => col(c)
      }: _*), "events")

    // documents: fresh deterministic synthesis. Vocabulary mixes
    // content words with each language's stopword list so langid /
    // quality / stopword metrics stay meaningful; ~1% of docs are
    // exact duplicates of their predecessor so exact-dedup stays
    // non-trivial without near-dup pair explosion.
    val nDocs = read("documents").count() * factor
    import spark.implicits._
    val docs = spark.range(nDocs).map { id =>
      val text = synthText(id)
      (id, text, langFor(id), s"src_${id % 7}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    write(docs, "documents")

    val nVecs = read("embeddings").count() * factor
    val dims = read("embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    val vecs = spark.range(nVecs).map { id =>
      (id, synthVec(id, dims), (id % Clusters % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
    write(vecs, "embeddings")
  }

  private val stop = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des", "une", "dans"),
    "es" -> Seq("el", "la", "los", "de", "que", "en", "una", "por"))
  private val langs = stop.keys.toSeq.sorted

  def langFor(id: Long): String = langs((id % langs.size).toInt)

  /** Deterministic text: 30–220 words drawn from a 4k-word content
    * vocabulary interleaved with the doc's language stopwords (every
    * third word), plus light punctuation. id%97==0 duplicates the
    * previous doc exactly (dedup fodder).
    */
  def synthText(id0: Long): String = {
    val id = if (id0 % 97 == 0 && id0 > 0) id0 - 1 else id0
    var s = id * 6364136223846793005L + 1442695040888963407L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = (Math.floorMod(next() >>> 16, bound.toLong)).toInt
    val sw = stop(langFor(id))
    val n = 30 + nextInt(191)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      if (i % 3 == 1) sb.append(sw(nextInt(sw.size)))
      else { sb.append('w'); sb.append(nextInt(4000)) }
      if (i % 11 == 10) sb.append(if (nextInt(4) == 0) '!' else '.')
      i += 1
    }
    sb.toString
  }

  /** Cluster count for the synthetic embedding space (labels project
    * to `Clusters % 10`, so per-label centroids stay meaningful too).
    */
  val Clusters = 64

  /** Deterministic CLUSTERED embedding: vec = center(id % Clusters)
    * + 0.35·noise(id), each component uniform in [-1, 1). Earlier
    * rounds generated pure i.i.d. noise, which makes every
    * nearest-neighbor eval vacuous (recall ~ 0 BY CONSTRUCTION — no
    * neighbor structure exists to find); with k centers + noise,
    * same-cluster cosine concentrates near 1/(1+0.35²) ≈ 0.89 and
    * cross-cluster near 0, so recall/tuning sweeps exhibit real
    * operating points at scale.
    */
  def synthVec(id: Long, dims: Int): Array[Float] = {
    var cs = (id % Clusters) * -7046029254386353131L + 0x2545F4914F6CDD1DL
    var s = id * 2862933555777941757L + 3037000493L
    Array.fill(dims) {
      cs = cs * 6364136223846793005L + 1442695040888963407L
      s = s * 2862933555777941757L + 3037000493L
      val center = ((cs >>> 20) % 2000000L - 1000000L) / 1000000.0f
      val noise = ((s >>> 20) % 2000000L - 1000000L) / 1000000.0f
      center + 0.35f * noise
    }
  }
}
