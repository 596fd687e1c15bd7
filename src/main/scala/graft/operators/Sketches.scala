package graft.operators

import graft.{OracleHash, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches over the corpus token
  * stream — the operators a 100 TB profiling pass actually runs when
  * exact `COUNT(DISTINCT)` or exact heavy-hitters would need an
  * unbounded shuffle. All three use the [[graft.OracleHash]] integer
  * family (poly-31 mod P string hash, 2-universal multiply-add
  * permutations), so the DuckDB oracle computes bit-identical hashes
  * and therefore bit-identical ESTIMATES — the sketch itself is
  * oracle-certified, not just sanity-checked.
  *
  * Scale shapes (the reason sketches exist):
  *  - KMV: per-partition distinct + global top-k-smallest is
  *    TakeOrdered (k rows per task cross the wire, not the key set);
  *  - HLL: the whole corpus reduces to m=128 (bucket, max-rho) pairs
  *    with map-side partial max — a full-reduction, the cheapest
  *    shape Spark has;
  *  - CMS: d·w bounded cells with map-side partial sums, so the
  *    shuffle is O(d·w) per task regardless of corpus size.
  * All three are trivially mergeable across partitions/streams
  * (set-union + re-min, bucket-wise max, cell-wise add — pinned in
  * SketchesSpec), which is what makes them the right tool on a
  * 1000-executor cluster.
  *
  * Reference scope note: the reference connector (s1ck/flink-neo4j)
  * has no sketch surface; these belong to the training-data-pipeline
  * extension of SURVEY §2.3.
  */
object Sketches {
  import OracleHash.{MulA, MulB, P}

  /** (token, poly-hash) pairs of one document — trimmed, lowered,
    * whitespace-split, empties dropped — matching the oracle's
    * `regexp_split_to_array(lower(trim(text)), '\s+')` + `len > 0`
    * convention used by every token-level operator. JVM loop for the
    * same reason as [[Dedup.shingleHashesJvm]]: per-codepoint
    * higher-order expressions don't codegen.
    */
  private[graft] def tokenPolysJvm(text: String): Array[(String, Long)] = {
    val w = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val out = Array.newBuilder[(String, Long)]
    var i = 0
    while (i < w.length) {
      val t = w(i)
      if (t.nonEmpty) out += ((t, OracleHash.poly(t, 0L)))
      i += 1
    }
    out.result()
  }

  /** Per-occurrence (token, h) frame over documents. */
  private def tokenHashes(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("text")).as[String]
      .flatMap(tokenPolysJvm)
      .toDF("token", "h")
  }

  /** Permutation `i` of hash column `h` as pure column arithmetic —
    * the [[graft.OracleHash.a]]/[[graft.OracleHash.b]] power constants
    * inlined as literals (constants < P, h < P ⇒ every intermediate
    * < P² < 2^60), so BIGINT math is exact on both engines.
    */
  private[graft] def perm(i: Int, h: Column): Column =
    (lit(OracleHash.a(i)) * h + lit(OracleHash.b(i))) % P

  /** All `depth` permutation constants as one literal array of
    * `(i, pa, pb)` structs — explode it to permute by a COLUMN index
    * without recomputing powers per row (the CMS depth loop).
    */
  private[graft] def permStructs(depth: Int): Column =
    array((0 until depth).map(i => struct(lit(i).as("i"),
      lit(OracleHash.a(i)).as("pa"), lit(OracleHash.b(i)).as("pb"))): _*)

  /** (bucket, rho) HLL register observations of a permuted-hash
    * column `hp` — bucket = hp mod m, rho = trailing-zeros(hp div m)
    * + 1 capped at 24, all exact integer arithmetic. The register
    * STATE of a partition/window is the per-bucket max; states merge
    * by bucket-wise max, which is what the streaming twin aggregates
    * under a watermark.
    */
  private[graft] def hllObservations(hp: Column, m: Int): (Column, Column) = {
    // integer quotient via exact double division: hp < 2^30 << 2^53
    val v = floor(hp / m.toDouble).cast("long")
    (hp % m,
      least(bit_count(v.bitwiseAND(-v) - 1) + 1, lit(24)).cast("int"))
  }

  /** Finalize an HLL estimate from a COMPLETE (bucket, m_j) register
    * frame (missing buckets must already be present as 0).
    */
  private[graft] def hllEstimate(regs: DataFrame, m: Int): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / m.toDouble)
    regs
      .agg(sum(pow(lit(2.0), -col("m_j"))).as("s"),
        sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("n_zero"))
      .select(round(alpha * m.toDouble * m.toDouble / col("s"), 6)
        .as("est_distinct"), col("n_zero"))
  }

  /** K-minimum-values distinct-count sketch over corpus tokens.
    *
    * Estimator: with h(1..k) the k smallest DISTINCT permuted hashes
    * (uniform on [0, P)), `est = (k-1) · P / h(k)`; if fewer than k
    * distinct hashes exist the sketch is exact and returns that
    * count. One row: k, kth_hash, n_kept, est_distinct,
    * true_distinct (exact, for the reported rel_err).
    */
  def kmvDistinct(spark: SparkSession, sfDir: String, k: Int = 256): DataFrame =
    kmvDistinctOn(Tables.documents(spark, sfDir), k)

  /** [[kmvDistinct]] over an arbitrary documents-shaped frame. */
  def kmvDistinctOn(docs: DataFrame, k: Int = 256): DataFrame = {
    val th = tokenHashes(docs)
    val kmin = th.select(perm(0, col("h")).as("hp"))
      .distinct()
      .orderBy(col("hp"))
      .limit(k)
    val sk = kmin.agg(max(col("hp")).as("kth_hash"),
      count(lit(1)).as("n_kept"))
    val tru = th.agg(countDistinct(col("token")).as("true_distinct"))
    sk.crossJoin(broadcast(tru))
      .withColumn("est_distinct",
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * P) /
            col("kth_hash").cast("double")), 6))
      .select(lit(k).cast("long").as("k"), col("kth_hash"), col("n_kept"),
        col("est_distinct"), col("true_distinct"),
        round((col("est_distinct") - col("true_distinct")) /
          col("true_distinct"), 6).as("rel_err"))
  }

  /** HyperLogLog distinct-count over corpus tokens, m buckets (a
    * power of two).
    *
    * Deterministic construction: permuted hash h splits into
    * `bucket = h mod m` and quotient `v = h div m`; the register
    * value is trailing-zero-count(v)+1 (the Flajolet–Martin rho),
    * capped at 24 (P/m < 2^24, and v = 0 means every bit "matched").
    * `bit_count((v & -v) - 1)` computes trailing zeros in exact
    * integer arithmetic on BOTH engines (v = 0 → bit_count(-1) = 64,
    * then the cap applies). The harmonic sum adds exact powers of two
    * (exponents in [-24, 0], well inside the 53-bit mantissa window),
    * so it is order-independent — safe under any partitioning.
    */
  def hllDistinct(spark: SparkSession, sfDir: String, m: Int = 128): DataFrame =
    hllDistinctOn(Tables.documents(spark, sfDir), m)

  /** [[hllDistinct]] over an arbitrary documents-shaped frame. */
  def hllDistinctOn(docs: DataFrame, m: Int = 128): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    val spark = docs.sparkSession
    val th = tokenHashes(docs)
    val (bucket, rho) = hllObservations(perm(0, col("h")), m)
    val regs = th.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("m_j"))
    val full = spark.range(m).toDF("bucket")
      .join(regs, Seq("bucket"), "left_outer")
      .select(coalesce(col("m_j"), lit(0)).as("m_j"))
    // alpha_m for m >= 64; both engines evaluate the identical
    // literal expression left-to-right, so the IEEE result agrees
    val est = hllEstimate(full, m)
    val tru = th.agg(countDistinct(col("token")).as("true_distinct"))
    est.crossJoin(broadcast(tru))
      .select(lit(m).cast("long").as("m"), col("est_distinct"), col("n_zero"),
        col("true_distinct"),
        round((col("est_distinct") - col("true_distinct")) /
          col("true_distinct"), 6).as("rel_err"))
  }

  /** Count-min sketch (depth d, width w) estimates for the exact
    * top-k corpus tokens: per depth row i, token mass lands in cell
    * `perm_i(h) mod w`; the estimate is the min over rows, an upper
    * bound on the true count (est >= true always — pinned in spec).
    * Returns (token, true_cnt, est_cnt) for the top-k by exact count
    * (ties broken by token), so the oracle certifies the exact same
    * collision pattern.
    */
  def cmsTopk(spark: SparkSession, sfDir: String, depth: Int = 4,
      width: Int = 1024, topk: Int = 20): DataFrame =
    cmsTopkOn(Tables.documents(spark, sfDir), depth, width, topk)

  /** [[cmsTopk]] over an arbitrary documents-shaped frame. */
  def cmsTopkOn(docs: DataFrame, depth: Int = 4, width: Int = 1024,
      topk: Int = 20): DataFrame = {
    val tc = tokenHashes(docs)
      .groupBy(col("token"), col("h")).agg(count(lit(1)).as("cnt"))
    // sketch cells: d·w bounded groups, partial-summed map-side; the
    // depth loop explodes a LITERAL (i, pa, pb) array so the power
    // constants ride the plan instead of being recomputed per row
    val pc = (col("pp.pa") * col("h") + col("pp.pb")) % P
    val cells = tc
      .select(explode(permStructs(depth)).as("pp"), col("h"), col("cnt"))
      .select(col("pp.i").as("i"), (pc % width).as("cell"), col("cnt"))
      .groupBy(col("i"), col("cell")).agg(sum(col("cnt")).as("ccnt"))
    val top = tc.orderBy(col("cnt").desc, col("token")).limit(topk)
    top
      .select(col("token"), col("cnt"),
        explode(permStructs(depth)).as("pp"), col("h"))
      .select(col("token"), col("cnt"), col("pp.i").as("i"),
        (pc % width).as("cell"))
      .join(cells, Seq("i", "cell"))
      .groupBy(col("token"), col("cnt"))
      .agg(min(col("ccnt")).as("est_cnt"))
      .select(col("token"), col("cnt").as("true_cnt"), col("est_cnt"))
      .orderBy(col("true_cnt").desc, col("token"))
  }

  /** KMV set-operation estimates between two source cohorts (Beyer et
    * al. 2007): the k-minimum-values sketch of the UNION of the two
    * token sets estimates |A∪B|, the fraction of the sketch's hashes
    * present in both sides estimates Jaccard, and their product
    * estimates |A∩B| — the cross-source vocabulary-overlap report
    * ("how much does cohort B add over cohort A?") that decides crawl
    * and mixture budgets. Exact truths ride along for the eval.
    *
    * 100 TB notes: the union sketch is MERGEABLE — in production each
    * source's k minima are precomputed once (the `dedup_incremental`
    * artifact discipline) and any pair's overlap estimate needs only
    * the two k-row sketches, never a corpus pass; here both passes
    * run inline to stay oracle-checkable. The corpus-scale work is
    * one hash-keyed membership aggregate with map-side partials;
    * TakeOrdered moves k rows per task.
    */
  def kmvOverlap(spark: SparkSession, sfDir: String, k: Int = 256): DataFrame = {
    import spark.implicits._
    val th = Tables.documents(spark, sfDir)
      .select(col("text"),
        (expr("CAST(substring(source, 4, 10) AS INT)") % 2 === 0).as("grpA"))
      .as[(String, Boolean)]
      .flatMap { case (t, g) =>
        tokenPolysJvm(t).iterator.map { case (_, h) => (h, g) }
      }.toDF("h", "grpA")
    val hp = th
      .select(perm(0, col("h")).as("hp"), col("grpA"))
      .groupBy(col("hp"))
      .agg(max(when(col("grpA"), 1L).otherwise(0L)).as("inA"),
        max(when(!col("grpA"), 1L).otherwise(0L)).as("inB"))
    val km = hp.orderBy(col("hp")).limit(k)
    val sk = km.agg(max(col("hp")).as("kth_hash"),
      count(lit(1)).as("n_kept"),
      sum(col("inA") * col("inB")).as("n_both"))
    val tru = hp.agg(count(lit(1)).as("true_union"),
      sum(col("inA") * col("inB")).as("true_intersection"))
    sk.crossJoin(broadcast(tru))
      .withColumn("est_union",
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * graft.OracleHash.P) /
            col("kth_hash").cast("double")), 6))
      .withColumn("est_jaccard",
        round(col("n_both").cast("double") / col("n_kept"), 6))
      .withColumn("est_intersection",
        round(col("est_jaccard") * col("est_union"), 6))
      .select(lit(k.toLong).as("k"), col("n_kept"), col("n_both"),
        col("est_union"), col("est_jaccard"), col("est_intersection"),
        col("true_union"), col("true_intersection"))
  }
}
