package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2.3
  * #23-25): exact brute-force top-k (the correctness baseline),
  * embedding near-dup pairs, and an LSH-bucketed approximate variant
  * (the 100 TB path).
  */
object Similarity {

  private def embWithNorm(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))
      .withColumn("nrm", norm(col("v")))

  /** Exact top-k cosine neighbors for a fixed query set (vec_id < 5).
    *
    * 100 TB notes: queries are broadcast (they are the small side by
    * construction); each data partition computes scores locally and
    * the per-query top-k is a single shuffle of k×|Q| rows via window
    * rank — the full score matrix is never materialized.
    * Ranking is on the 6-dp-rounded score (ties → vec_id) so the
    * DuckDB oracle ranks identically despite float fold-order noise.
    */
  def topkBruteforce(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val emb = embWithNorm(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
    val scored = emb.filter(col("vec_id") >= 5).crossJoin(broadcast(queries))
      .withColumn("score", round(
        when(col("nrm") === 0.0 || col("q_nrm") === 0.0, 0.0)
          .otherwise(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm"))), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** [[topkBruteforce]] re-spelled with the mergeable
    * [[graft.functions.TopKAggregate]]: identical output, but the
    * per-query top-k is a two-phase bounded aggregate — every map
    * task keeps ≤ k candidates per query before the exchange, so the
    * shuffle carries k·|queries|·tasks rows instead of the full
    * |corpus|·|queries| score matrix the window spelling sorts. THE
    * vector-search reduction shape for a billion-vector corpus.
    */
  def topkAgg(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregate(k))
    val emb = embWithNorm(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
    emb.filter(col("vec_id") >= 5).crossJoin(broadcast(queries))
      .withColumn("score", round(
        when(col("nrm") === 0.0 || col("q_nrm") === 0.0, 0.0)
          .otherwise(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm"))), 6))
      .groupBy(col("q_id"))
      .agg(topk(col("vec_id"), col("score")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "row")))
      .select(col("q_id"), (col("i") + 1).cast("long").as("rank"),
        col("row._1").as("vec_id"), col("row._2").as("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** XOR masks addressing every bucket within Hamming distance
    * `radius` of a bucket, for `nPlanes`-bit bucket ids (mask 0 = the
    * bucket itself).
    */
  def probeMasks(nPlanes: Int, radius: Int): Seq[Long] =
    (0L until (1L << nPlanes)).filter(m => java.lang.Long.bitCount(m) <= radius)

  /** Plane count for a corpus of `n` vectors: the smallest k in
    * [4, 16] with `targetBucket * 2^k >= n`, i.e.
    * ceil(log2(n/targetBucket)) — buckets stay ~`targetBucket` deep as
    * the corpus grows. Integer-exact (shift-and-compare, no float
    * log), so the DuckDB oracle derives the identical k from its own
    * COUNT(*). With radius fixed, probe count grows as C(k,2) =
    * O(log^2 n) while bucket count grows as n/targetBucket, so
    * candidate volume is O(n log^2 n) — sub-quadratic at any scale.
    * The [4, 16] clamp bounds SQL/codegen size; lifting it past 16
    * only needs more plane literals.
    */
  def planesFor(n: Long, targetBucket: Long = 32L): Int =
    (4 to 16).find(k => (targetBucket << k) >= n).getOrElse(16)

  /** Embedding near-duplicate pairs: cosine ≥ τ, blocked on
    * random-hyperplane LSH buckets (the same literal planes as
    * [[annLsh]]). One side probes every bucket within Hamming ≤
    * `radius` of its own, so a pair becomes a candidate iff their
    * bucket ids differ in ≤ `radius` planes; candidates are verified
    * with the exact cosine.
    *
    * Scale: candidate volume is Σ_buckets |b|·|probe(b)| — buckets
    * shrink 2× per plane, and the plane count is DERIVED from the
    * corpus size (`nPlanes <= 0` → [[planesFor]](count), the smallest
    * k with 32·2^k ≥ N), so per-bucket depth stays ~32 while the probe
    * count grows only as C(k,2): candidate volume is O(N log²N), not
    * the fixed-plane O(N²·c). No low-cardinality key (the former
    * `label` blocking) ever forms an O(N²/|labels|) block.
    * Approximation is by-design and measured: at a production near-dup
    * threshold (cosine ≥ 0.9, θ≈26°) a pair agrees per plane w.p.
    * 1−θ/π ≈ 0.857, so radius 2 holds ≥ 0.99 recall for small plane
    * counts; SimilaritySpec pins recall ≥ 0.85 against the exact
    * all-pairs truth even at this synthetic corpus's much weaker
    * τ = 0.35 (θ ≈ 69°), and pins the candidate fraction ≤ 10% of all
    * pairs at a 64k-vector corpus. At recall-critical large-N + weak-τ
    * combinations, band the planes (AND-OR amplification, as in
    * [[graft.operators.Dedup]]'s MinHash) instead of raising radius.
    */
  def embCosineDup(spark: SparkSession, sfDir: String, tau: Double = 0.35,
      nPlanes: Int = -1, radius: Int = 2): DataFrame = {
    // widen ahead of the candidate join (r18 optimization round): the
    // per-candidate 64-dim dot products are the query's entire cost
    // and ride the probe join's stream side, which otherwise runs at
    // the scan's width (observed as a 1.2 s single-task stage at
    // bench scale); no-op when the scan is already wide
    val emb = graft.Frames.widen(embWithNorm(spark, sfDir))
    val np = if (nPlanes > 0) nPlanes
             else planesFor(Tables.embeddings(spark, sfDir).count())
    val bucket = (0 until np).map { p =>
      val proj = dot(col("v"),
        array((0 until 64).map(d => lit(planeComponent(p, d))): _*))
      when(proj >= 0.0, lit(1L << p)).otherwise(0L)
    }.reduce((x, y) => x.bitwiseOR(y))
    val bucketed = emb.withColumn("bucket", bucket)
    val a = bucketed.select(col("bucket"), col("vec_id").as("a_id"),
      col("v").as("a_v"), col("nrm").as("a_nrm"))
    // each probe mask is a distinct bucket id, so a qualifying pair
    // matches on exactly one mask — no duplicate candidates, no
    // post-join distinct
    val b = bucketed
      .withColumn("probe", explode(array(
        probeMasks(np, radius).map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
      .select(col("probe"), col("vec_id").as("b_id"),
        col("v").as("b_v"), col("nrm").as("b_nrm"))
    a.join(b, col("bucket") === col("probe") && col("a_id") < col("b_id"))
      .withColumn("cosine", round(
        when(col("a_nrm") === 0.0 || col("b_nrm") === 0.0, 0.0)
          .otherwise(dot(col("a_v"), col("b_v")) / (col("a_nrm") * col("b_nrm"))), 6))
      .filter(col("cosine") >= tau)
      .select(col("a_id"), col("b_id"), col("cosine"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Embedding-space decontamination: flag corpus vectors whose
    * cosine against ANY benchmark vector (the vec_id % benchMod
    * holdout, mirroring [[graft.operators.Pipeline.contamination]]'s
    * n-gram split) reaches tau — the semantic-leakage screen that
    * catches paraphrased benchmark items an exact n-gram overlap
    * misses. Returns flagged vectors with their hit count, best
    * score, and the argmax benchmark id (ties → smallest id, via
    * lexicographic struct max on the 6-dp-rounded score).
    *
    * 100 TB notes: the benchmark set is small by construction and
    * BROADCAST — the corpus-side pass is embarrassingly parallel
    * map work (|B| dots per vector, the brute-force baseline;
    * [[embCosineDup]]'s LSH bucketing is the drop-in when |B| grows);
    * the only shuffle is the per-vector aggregate, already collapsed
    * to ≤1 row per flagged vector by map-side partials.
    */
  def contaminationEmbedding(spark: SparkSession, sfDir: String,
      benchMod: Long = 29L, tau: Double = 0.35): DataFrame = {
    val emb = embWithNorm(spark, sfDir)
    val bench = emb.filter(col("vec_id") % benchMod === 0)
      .select(col("vec_id").as("b_id"), col("v").as("b_v"),
        col("nrm").as("b_nrm"))
    emb.filter(col("vec_id") % benchMod =!= 0)
      .crossJoin(broadcast(bench))
      .withColumn("cos", round(
        when(col("nrm") === 0.0 || col("b_nrm") === 0.0, 0.0)
          .otherwise(dot(col("v"), col("b_v")) / (col("nrm") * col("b_nrm"))), 6))
      .filter(col("cos") >= tau)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_hits"),
        max(struct(col("cos"), (-col("b_id")).as("nb"))).as("best"))
      .select(col("vec_id"), col("n_hits"),
        (col("best").getField("cos") + lit(0.0)).as("max_cos"),
        (-col("best").getField("nb")).as("bench_id"))
      .orderBy(col("vec_id"))
  }

  /** Deterministic pseudo-random hyperplane component for
    * (plane, dim), exact in any engine: a squared-permutation integer
    * hash (all ops < 2^62, see [[graft.OracleHash]]) reduced to 24
    * bits, then scaled to [-1, 1) by power-of-two division (exact
    * double ops). Evaluated at plan time — it enters the Spark plan
    * and the DuckDB oracle as the same literal.
    */
  def planeComponent(plane: Int, dim: Int): Double = {
    import graft.OracleHash.{MulA, MulB, P}
    val s = plane * 131071 + dim
    val h1 = (MulA * (s + 1)) % P
    val h2 = (h1 * h1 + MulB * (s + 1)) % P
    (h2 % (1 << 24)).toDouble / (1 << 24) * 2.0 - 1.0
  }

  /** Per-label centroid components (label prototypes / cluster
    * centers): explode dimensions → one shuffle on (label, dim) with
    * map-side partial sums. Components accumulate through
    * decimal(28,12) so parallel combine order cannot perturb low bits
    * (the oracle sums the identical decimals). Long output shape
    * (label, d, centroid) keeps the result engine-agnostic.
    *
    * 100 TB: the shuffle carries (label, dim, partial-sum) triples —
    * bounded by |labels|×dims×partitions, independent of row count.
    */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg(sum(col("x").cast("decimal(28,12)")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("d").cast("long").as("d"),
        round(col("s").cast("double") / col("n"), 6).as("centroid"))
      .orderBy(col("label"), col("d"))

  /** The coarse quantizer as a ONE-ROW sorted (cell, cvec) array —
    * the broadcastable piece of the IVF index, shared by the batch
    * queries and the streaming serving twin
    * ([[graft.streaming.StreamingJobs.annServe]]).
    */
  def ivfQuantizer(spark: SparkSession, sfDir: String): DataFrame =
    labelCentroids(spark, sfDir)
      .groupBy(col("label").as("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("d"), col("centroid")))),
        s => s.getField("centroid")).as("cvec"))
      .agg(sort_array(collect_list(struct(col("cell"), col("cvec")))).as("cs"))

  /** The static IVF serving index: every data vector (vec_id ≥ 5)
    * assigned to its nearest cell, with vector and norm attached —
    * what a production deployment materializes once and serves many
    * query streams against.
    */
  def ivfIndex(spark: SparkSession, sfDir: String): DataFrame =
    ivfCellRanking(spark, sfDir, embWithNorm(spark, sfDir))
      .filter(col("vec_id") >= 5)
      .select(element_at(col("pcs"), 1).getField("cell").as("cell"),
        col("vec_id"), col("v"), col("nrm"))

  /** Per-vector in-row cell ranking against the broadcast coarse
    * quantizer — the IVF assignment step shared by [[annIvf]] and
    * [[ivfTuning]], spelled exactly like [[kmeansAssignOn]]'s argmin:
    * the quantizer collapses to a ONE-ROW sorted (cell, cvec) array,
    * broadcast-carried onto every vector row, and the full cell
    * ranking is computed IN-ROW as `array_sort(zip(d², cell))` — a
    * pure map over the corpus. No corpus × |cells| explode, no
    * vec_id-partitioned window exchange: at 100 TB the assignment
    * costs one broadcast plus one scan, independent of cell count's
    * contribution to shuffle volume.
    *
    * Distances use d² = v·v − 2·v·c + c·c so both engines fold the
    * identical IEEE sequence; the struct sort breaks d² ties on the
    * ascending cell id (same order as the former window's
    * `ORDER BY d2, cell`).
    */
  private def ivfCellRanking(spark: SparkSession, sfDir: String,
      emb: DataFrame): DataFrame = {
    val cs = ivfQuantizer(spark, sfDir)
    emb.crossJoin(broadcast(cs))
      .withColumn("ds", transform(col("cs"), c =>
        dot(col("v"), col("v")) -
          lit(2.0) * dot(col("v"), c.getField("cvec")) +
          dot(c.getField("cvec"), c.getField("cvec"))))
      .withColumn("pcs", array_sort(zip_with(col("ds"), col("cs"),
        (d, c) => struct(d.as("d2"), c.getField("cell").as("cell")))))
      .drop("ds", "cs")
  }

  /** IVF-style ANN: the label centroids act as a coarse quantizer.
    * Every vector is assigned to its nearest centroid cell via
    * [[ivfCellRanking]]'s zero-exchange in-row argmin; each query
    * probes its `nprobe` nearest cells and ranks exactly within them.
    * At scale the cells are the pruning mechanism: a query scores
    * ~nprobe/|cells| of the corpus.
    */
  def annIvf(spark: SparkSession, sfDir: String, k: Int = 10, nprobe: Int = 2)
      : DataFrame = {
    val emb = embWithNorm(spark, sfDir)
    val ranked = ivfCellRanking(spark, sfDir, emb)
    // data side: nearest cell only (head of the in-row ranking);
    // query side: the nprobe nearest cells, exploded to probe rows
    val data = ranked.filter(col("vec_id") >= 5)
      .select(element_at(col("pcs"), 1).getField("cell").as("cell"),
        col("vec_id"), col("v"), col("nrm"))
    val probes = ranked.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"),
        col("nrm").as("q_nrm"), explode(slice(col("pcs"), 1, nprobe)).as("pc"))
      .select(col("pc").getField("cell").as("cell"), col("q_id"),
        col("q_v"), col("q_nrm"))
    val scored = data.join(broadcast(probes), Seq("cell"))
      .withColumn("score", round(
        when(col("nrm") === 0.0 || col("q_nrm") === 0.0, 0.0)
          .otherwise(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm"))), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF nprobe TUNING CURVE — the cell-probe dial next to
    * [[annTuning]]'s hyperplane sweep: for every probe count on the
    * grid, the measured recall@k of [[annIvf]]-style retrieval
    * against the exact top-k AND the candidate volume. Probing more
    * cells monotonically buys recall at linear candidate cost — this
    * is the table that picks nprobe for a latency budget.
    *
    * 100 TB notes: the cell assignment (the corpus-scale pass) runs
    * ONCE and materializes; each grid cell then adds only a broadcast
    * probe join against it plus the shared exact side. The centroid
    * table stays broadcast-sized.
    */
  def ivfTuning(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val exact = topkBruteforce(spark, sfDir, k)
      .select(col("q_id"), col("vec_id")).localCheckpoint(true)
    val emb = embWithNorm(spark, sfDir)
    val ranked = ivfCellRanking(spark, sfDir, emb)
    val maxProbe = 4
    val data = graft.Frames.leaf(
      ranked.filter(col("vec_id") >= 5)
        .select(element_at(col("pcs"), 1).getField("cell").as("cell"),
          col("vec_id"), col("v"), col("nrm")))
    val qRanks = graft.Frames.leaf(
      ranked.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("q_v"),
          col("nrm").as("q_nrm"),
          posexplode(slice(col("pcs"), 1, maxProbe)).as(Seq("i", "pc")))
        .select(col("pc").getField("cell").as("cell"),
          (col("i") + 1).as("rk"), col("q_id"), col("q_v"), col("q_nrm")))
    Seq(1, 2, 4).map { p =>
      val probes = qRanks.filter(col("rk") <= p).drop("rk")
      val cand = data.join(broadcast(probes), Seq("cell"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("vec_id"))
      val ann = cand
        .withColumn("score", round(
          when(col("nrm") === 0.0 || col("q_nrm") === 0.0, 0.0)
            .otherwise(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm"))),
          6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      val recall = exact.join(broadcast(ann), Seq("q_id", "vec_id"), "left_outer")
        .groupBy(col("q_id")).agg(count(col("hit")).as("n_hit"))
        .agg(round(avg(col("n_hit").cast("double") / k), 6).as("mean_recall"))
      val volume = cand.agg(count(lit(1)).as("total_candidates"))
      recall.crossJoin(volume)
        .select(lit(p.toLong).as("nprobe"),
          (col("mean_recall") + lit(0.0)).as("mean_recall"),
          col("total_candidates"))
    }.reduce(_.unionByName(_)).orderBy(col("nprobe"))
  }

  /** IVFPQ (Jégou et al. 2011): the full billion-vector ANN
    * composition — IVF coarse cells prune the corpus, PQ codes give a
    * compressed in-cell distance, and only a small ADC shortlist pays
    * the exact re-rank. Pipeline per query: probe the `nprobe`
    * nearest cells ([[ivfCellRanking]]'s zero-exchange assignment) →
    * score every candidate by ASYMMETRIC DISTANCE (ADC): the query
    * precomputes, per subspace, its d² to all `cb` codebook centroids
    * (a cb×m table, tiny and broadcast), and a candidate's score is an
    * IN-ROW fold over its m codes — no vector arithmetic per pair,
    * just m table lookups → keep the `cand` best per query → exact
    * cosine re-rank of that shortlist → top-k.
    *
    * Determinism: codebooks are [[kmeansCentroidsOn]]'s deterministic
    * Lloyd output; the ADC fold runs in fixed subspace order (an
    * in-row array fold, not a float groupBy); all ranking keys are
    * 6-dp rounded with vec_id ties.
    *
    * 100 TB notes: the per-pair work is m=4 array lookups + adds on
    * an in-cell candidate set (~nprobe/|cells| of the corpus); the
    * exact side touches only cand×|queries| rows. Codes are derived
    * here and joined once on vec_id (in production they are stored
    * inline with the vector row — the join disappears); codebooks and
    * query tables are broadcast-sized (m·cb centroids of dim/m).
    */
  def annIvfPq(spark: SparkSession, sfDir: String, k: Int = 10,
      nprobe: Int = 2, m: Int = 4, cb: Int = 8, iters: Int = 3,
      dim: Int = 64, cand: Int = 50, trainMod: Int = 4): DataFrame = {
    val emb = embWithNorm(spark, sfDir)
    val ranked = ivfCellRanking(spark, sfDir, emb)
    val data = ranked.filter(col("vec_id") >= 5)
      .select(element_at(col("pcs"), 1).getField("cell").as("cell"),
        col("vec_id"), col("v"), col("nrm"))
    val probes = ranked.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
        explode(slice(col("pcs"), 1, nprobe)).as("pc"))
      .select(col("pc").getField("cell").as("cell"), col("q_id"))
    val subDim = dim / m
    val embV = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // ALL m subspaces in one (sub, vec_id, v) frame: the Lloyd loop
    // trains every codebook simultaneously with centroids keyed
    // (sub, cell) — iters jobs total instead of m·iters (the per-sub
    // arithmetic is identical, just batched; the oracle's per-sub CTE
    // blocks compute the same numbers). Codebooks train on a
    // deterministic HASH-SPREAD ~1/trainMod subsample — the
    // production discipline (only the one-pass ASSIGNMENT reads the
    // full corpus), and the spread matters: a first-N prefix sample is
    // cluster-BIASED on corpora whose ids correlate with content, and
    // prefix-trained codebooks collapsed IVFPQ recall at 100× scale
    // in round-10 measurement. The LCG spread is engine-agnostic
    // (OracleHash constants), so the DuckDB oracle samples
    // identically.
    import graft.OracleHash.{MulA, MulB, P}
    val (subs, cents) = pqTrain(embV, m, subDim, cb, iters,
      pmod(lit(MulA) * col("vec_id") + lit(MulB), lit(P)) % trainMod === 0)
    val codesAll = pqAssign(subs.filter(col("vec_id") >= 5), cents)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("cell")))),
        s => s.getField("cell").cast("int")).as("codes"))
    val csAll = cents.groupBy(col("sub"))
      .agg(sort_array(collect_list(struct(col("cell"), col("cvec")))).as("cs"))
    val qtabs = subs.filter(col("vec_id") < 5)
      .join(broadcast(csAll), Seq("sub"))
      .withColumn("dtab", transform(col("cs"), c =>
        dot(col("v"), col("v")) -
          lit(2.0) * dot(col("v"), c.getField("cvec")) +
          dot(c.getField("cvec"), c.getField("cvec"))))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("dtab")))),
        s => s.getField("dtab")).as("dtabs"))
      .withColumnRenamed("vec_id", "q_id")
    // ADC: in-row fold over the m (code, table) pairs in subspace
    // order — cell ids are 0..cb-1 (first-k init), so code+1 indexes
    // the sorted table directly
    val candScored = data.join(broadcast(probes), Seq("cell"))
      .join(codesAll, Seq("vec_id"))
      .join(broadcast(qtabs), Seq("q_id"))
      .withColumn("adc", round(aggregate(
        zip_with(col("codes"), col("dtabs"),
          (code, tab) => element_at(tab, code + 1)),
        lit(0.0), (acc, x) => acc + x), 6))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").asc, col("vec_id"))
    val shortlist = candScored.withColumn("crk", row_number().over(wAdc))
      .filter(col("crk") <= cand)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    shortlist.join(broadcast(q), Seq("q_id"))
      .withColumn("score", round(
        when(col("nrm") === 0.0 || col("q_nrm") === 0.0, 0.0)
          .otherwise(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm"))), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Batched multi-subspace argmin assignment against (sub, cell)
    * centroids: per-sub one-row centroid arrays broadcast-joined on
    * `sub`, distances and the argmin computed in-row — a pure map
    * over the (sub, vec_id, v) frame. Shared by [[pq]] and
    * [[annIvfPq]].
    */
  private def pqAssign(frame: DataFrame, cents: DataFrame): DataFrame = {
    val cs = cents.groupBy(col("sub"))
      .agg(sort_array(collect_list(struct(col("cell"), col("cvec")))).as("cs"))
    frame.join(broadcast(cs), Seq("sub"))
      .withColumn("ds", transform(col("cs"), c =>
        dot(col("v"), col("v")) -
          lit(2.0) * dot(col("v"), c.getField("cvec")) +
          dot(c.getField("cvec"), c.getField("cvec"))))
      .withColumn("best",
        array_position(col("ds"), array_min(col("ds"))).cast("int"))
      .select(col("sub"), col("vec_id"), col("v"),
        element_at(col("cs"), col("best")).getField("cell").as("cell"),
        element_at(col("ds"), col("best")).as("d2"))
  }

  /** Batched multi-subspace Lloyd training: slices every vector into
    * `m` subvectors in ONE (sub, vec_id, v) frame and trains all `m`
    * codebooks simultaneously with centroids keyed (sub, cell) —
    * `iters` checkpointed jobs total instead of m·iters, identical
    * per-subspace arithmetic. Returns (subs frame, final centroids).
    */
  private def pqTrain(embV: DataFrame, m: Int, subDim: Int, cb: Int,
      iters: Int, trainFilter: Column): (DataFrame, DataFrame) = {
    val subs = (0 until m).map { s =>
      embV.select(lit(s).as("sub"), col("vec_id"),
        slice(col("v"), s * subDim + 1, subDim).as("v"))
    }.reduce(_.unionByName(_))
    val train = subs.filter(trainFilter).localCheckpoint()
    // init from the FULL frame's first cb vectors (always present —
    // a sampled training set need not contain the low vec_ids), then
    // Lloyd refines over the training sample only
    var cents = subs.filter(col("vec_id") < cb)
      .select(col("sub"), col("vec_id").cast("int").as("cell"),
        col("v").as("cvec"))
      .localCheckpoint()
    for (_ <- 1 until iters) {
      val means = pqAssign(train, cents)
        .select(col("sub"), col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("sub"), col("cell"), col("d"))
        .agg(sum(col("x").cast("decimal(28,12)")).as("s"), count(lit(1)).as("n"))
        .select(col("sub"), col("cell"), col("d"),
          round(col("s").cast("double") / col("n"), 6).as("m"))
        .groupBy(col("sub"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
          s => s.getField("m")).as("mvec"))
      cents = cents.join(means, Seq("sub", "cell"), "left")
        .select(col("sub"), col("cell"),
          coalesce(col("mvec"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    (subs, cents)
  }

  /** Deterministic k-means over the embedding corpus — the semantic
    * clustering step of a curation pipeline (cluster-balanced
    * sampling, semantic dedup, topic bucketing). Init is the first
    * `k` vectors by id; `iters` assignment rounds with Lloyd updates
    * between them; ties in the argmin break to the smaller cell id.
    *
    * Determinism across engines (the DuckDB oracle unrolls the same
    * iterations as CTEs, [[graft.OracleSql.kmeans]]): distances are
    * d² = v·v − 2·(v·c) + c·c folded left-to-right in double on both
    * sides; centroid components accumulate through decimal(28,12) and
    * are rounded to 6 dp each round, so parallel combine order cannot
    * perturb the next iteration's input.
    *
    * 100 TB notes: the centroid table is k×dims doubles — broadcast —
    * so ASSIGNMENT IS A PURE MAP over the corpus (argmin computed
    * per-row from a one-row centroid-array frame; no join shuffle, no
    * window). The Lloyd update explodes (cell, dim, x) but partial
    * aggregation collapses it to k·dims rows per partition before the
    * one tiny exchange. Per iteration: one broadcast + one k·dims-key
    * shuffle — independent of corpus size.
    */
  def kmeans(spark: SparkSession, sfDir: String, k: Int = 8, iters: Int = 4)
      : DataFrame =
    kmeansAssign(spark, sfDir, k, iters)
      .select(col("vec_id"), col("cell"), round(col("d2"), 6).as("dist2"))
      .orderBy(col("vec_id"))

  /** Product quantization (Jégou et al. 2011, the IVFPQ building
    * block): the vector is split into `m` contiguous subvectors and
    * each subspace gets its OWN small codebook trained by the same
    * deterministic Lloyd loop as [[kmeans]] — a vector's code is its
    * m cell ids, and memory per vector drops from dim floats to m
    * bytes. Returns one row per (vec_id, sub): the assigned code and
    * the 6-dp subspace reconstruction error (their sum is the
    * vector's total quantization error).
    *
    * 100 TB notes: each subspace pass is [[kmeans]]'s shape —
    * broadcast k×(dim/m) codebook, pure-map assignment, per-iter cost
    * independent of corpus size — and the m passes share the one
    * embeddings scan (column-pruned to vec_id+embedding). Codebook
    * training would subsample at real scale; assignment (the
    * corpus-scale step) is shuffle-free.
    */
  def pq(spark: SparkSession, sfDir: String, m: Int = 4, k: Int = 8,
      iters: Int = 3, dim: Int = 64): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (subs, cents) = pqTrain(emb, m, dim / m, k, iters, lit(true))
    pqAssign(subs, cents)
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        col("cell").cast("long").as("code"),
        (round(col("d2"), 6) + lit(0.0)).as("dist2"))
      .orderBy(col("vec_id"), col("sub"))
  }

  /** Lloyd iterations returning the final assignment WITH the vector
    * still attached: (vec_id, v, cell, d2). Shared by [[kmeans]] and
    * [[semanticDedup]] so both certify the identical clustering.
    */
  private def kmeansAssign(spark: SparkSession, sfDir: String, k: Int,
      iters: Int): DataFrame =
    kmeansAssignOn(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v")),
      k, iters)

  /** [[kmeansAssign]] over an arbitrary (vec_id, v) frame — shared
    * with [[pq]], which runs it once per subvector slice.
    */
  private def kmeansAssignOn(emb: DataFrame, k: Int, iters: Int): DataFrame =
    kmeansAssignTo(emb, kmeansCentroidsOn(emb, k, iters))

  /** Argmin assignment of `emb` against a (cell, cvec) centroid
    * frame: broadcast one-row centroid array, in-row distances, first
    * index of the min = smallest cell id among ties (cs is sorted by
    * cell). Pure map over the corpus.
    */
  private def kmeansAssignTo(emb: DataFrame, cents: DataFrame): DataFrame = {
    val cs = cents.agg(
      sort_array(collect_list(struct(col("cell"), col("cvec")))).as("cs"))
    emb.crossJoin(broadcast(cs))
      .withColumn("ds", transform(col("cs"), c =>
        dot(col("v"), col("v")) -
          lit(2.0) * dot(col("v"), c.getField("cvec")) +
          dot(c.getField("cvec"), c.getField("cvec"))))
      .withColumn("best", array_position(col("ds"), array_min(col("ds"))).cast("int"))
      .select(col("vec_id"), col("v"),
        element_at(col("cs"), col("best")).getField("cell").as("cell"),
        element_at(col("ds"), col("best")).as("d2"))
  }

  /** The Lloyd loop's final (cell, cvec) centroids — exposed so
    * [[annIvfPq]] can score against the trained codebooks, not just
    * read assignments.
    */
  private def kmeansCentroidsOn(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("cvec"))
      .localCheckpoint()
    for (_ <- 1 until iters) {
      val means = kmeansAssignTo(emb, cents)
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(sum(col("x").cast("decimal(28,12)")).as("s"), count(lit(1)).as("n"))
        .select(col("cell"), col("d"),
          round(col("s").cast("double") / col("n"), 6).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
          s => s.getField("m")).as("mvec"))
      // a cell that captured no vectors keeps its previous centroid
      cents = cents.join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("mvec"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    cents
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., 2023,
    * arXiv:2303.09540): cluster the embedding corpus with [[kmeans]],
    * then WITHIN each cluster drop every vector that has a
    * lower-vec_id cluster-mate with cosine >= tau. The greedy
    * keep-lowest-id rule is deterministic and local to a cluster, so
    * the result is a pure function of (embeddings, k, iters, tau).
    * Returns (vec_id, cell, dup_of, keep): `dup_of` is the smallest
    * qualifying lower id (NULL for keepers).
    *
    * 100 TB shape — the whole point of clustering first: the
    * quadratic pair join runs per-cluster, so candidate volume is
    * Σ|cluster|² instead of N²; k grows with the corpus to hold
    * |cluster| ~ N/k constant, and the pair join shuffles on `cell`
    * (one key per cluster — skew shows up only if a cluster
    * degenerates, which the kmeans objective resists). The final
    * attribution join is a broadcast of the (small) dup list.
    */
  def semanticDedup(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 4, tau: Double = 0.35): DataFrame = {
    val asg = kmeansAssign(spark, sfDir, k, iters)
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val a = asg.select(col("cell"), col("vec_id").as("a_id"),
      col("v").as("a_v"), col("nrm").as("a_nrm"))
    val b = asg.select(col("cell"), col("vec_id").as("b_id"),
      col("v").as("b_v"), col("nrm").as("b_nrm"))
    val dups = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", round(
        when(col("a_nrm") === 0.0 || col("b_nrm") === 0.0, 0.0)
          .otherwise(dot(col("a_v"), col("b_v")) /
            (col("a_nrm") * col("b_nrm"))), 6))
      .filter(col("cosine") >= tau)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("dup_of"))
    asg.select(col("vec_id"), col("cell"))
      .join(broadcast(dups), col("vec_id") === col("b_id"), "left_outer")
      .select(col("vec_id"), col("cell"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
      .orderBy(col("vec_id"))
  }

  /** Embedding-corpus QA: per-dimension mean, 6-dp-rounded variance,
    * and min/max — the drift/collapse screen run before trusting a
    * new embedding batch (a dimension with ~zero variance is dead; a
    * shifted mean signals an encoder change).
    *
    * 100 TB notes: explode to (dim, x) then ONE shuffle keyed by the
    * 64 dimension ids with map-side partial aggregation — the
    * exchange carries dims×partitions partial rows, independent of
    * corpus size. Moments accumulate through decimal(28,12) (sums)
    * exactly, so the DuckDB twin reproduces the rounded values
    * bit-for-bit; variance = E[x²]−E[x]² computed on the rounded
    * moments on BOTH sides.
    */
  def dimStats(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(posexplode(toDouble(col("embedding"))).as(Seq("d", "x")))
    val m1 = round(sum(col("x").cast("decimal(28,12)")).cast("double")
      / count(lit(1)), 6)
    val m2 = round(sum((col("x") * col("x")).cast("decimal(28,12)")).cast("double")
      / count(lit(1)), 6)
    e.groupBy(col("d"))
      .agg(m1.as("mean"), m2.as("m2"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"))
      .select(col("d").cast("long").as("d"), col("mean"),
        round(col("m2") - col("mean") * col("mean"), 6).as("variance"),
        col("min_x"), col("max_x"))
      .orderBy(col("d"))
  }

  /** Symmetric int8 scalar quantization of the embedding corpus —
    * the serving-memory trick (4× smaller vectors, int8 SIMD dot
    * products). Per-dimension scale = max |x| over the corpus;
    * code = half-up round of 127·x/scale, so codes span [−127, 127]
    * and each dimension's extreme saturates by construction. Output
    * is per-vector code diagnostics in exact integers — the
    * hash-stable spelling of "did quantization preserve the vector"
    * (code_sum drift ≈ quantization bias; n_sat counts saturated
    * dims).
    *
    * 100 TB notes: the scale pass is the [[dimStats]] exchange — ONE
    * shuffle keyed by the 64 dimension ids, map-side partials, cost
    * independent of corpus size past the scan; the 64 scales then
    * ride back as a broadcast 1-row array and quantization itself is
    * a pure per-row `zip_with` map (no second shuffle, no join). The
    * half-up `floor(x·127/s + 0.5)` is IEEE-deterministic, so codes
    * are bit-identical across engines — no round-half-even
    * divergence.
    */
  def quantizeInt8(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val scales = emb
      .select(posexplode(toDouble(col("embedding"))).as(Seq("d", "x")))
      .groupBy(col("d")).agg(max(abs(col("x"))).as("scale"))
      .agg(array_sort(collect_list(struct(col("d"), col("scale")))).as("ds"))
      .select(transform(col("ds"), s => s("scale")).as("scales"))
    emb.crossJoin(broadcast(scales))
      .select(col("vec_id"),
        zip_with(toDouble(col("embedding")), col("scales"),
          (x, s) => when(s === 0.0, lit(0))
            .otherwise(floor(x * lit(127.0) / s + lit(0.5)).cast("int")))
          .as("codes"))
      .select(col("vec_id"),
        size(col("codes")).cast("long").as("n_dims"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        array_min(col("codes")).as("code_min"),
        array_max(col("codes")).as("code_max"),
        size(filter(col("codes"), c => abs(c) === 127)).cast("long")
          .as("n_sat"))
      .orderBy(col("vec_id"))
  }

  /** Approximate nearest neighbors via random-hyperplane LSH:
    * `nPlanes` signed projections give a bucket id; each query only
    * scores vectors in its own bucket. The scale path for
    * [[topkBruteforce]] — the plane count is derived from the corpus
    * size (`nPlanes <= 0` → [[planesFor]](count)), so bucket
    * population stays ~32 and work per query is O(probes · bucket) =
    * O(log N · bucket), not O(N).
    *
    * Queries are multi-probed: each query searches its own bucket and
    * every Hamming-1 neighbor bucket (nPlanes+1 probes) — the standard
    * trick to recover recall that single-probe hyperplane LSH loses on
    * weakly-clustered vectors, at probe-count (not data) cost.
    *
    * Output: per query, top-k within-probed-buckets neighbors
    * (rows-only oracle; SimilaritySpec checks recall vs brute force).
    */
  def annLsh(spark: SparkSession, sfDir: String, k: Int = 10, nPlanes: Int = -1)
      : DataFrame = {
    val emb = embWithNorm(spark, sfDir)
    val np = if (nPlanes > 0) nPlanes
             else planesFor(Tables.embeddings(spark, sfDir).count())
    val bucket = (0 until np).map { p =>
      val proj = dot(col("v"),
        array((0 until 64).map(d => lit(planeComponent(p, d))): _*))
      when(proj >= 0.0, lit(1L << p)).otherwise(0L)
    }.reduce((x, y) => x.bitwiseOR(y))
    val bucketed = emb.withColumn("bucket", bucket)
    val queries = bucketed.filter(col("vec_id") < 5)
      .select(col("bucket"), col("vec_id").as("q_id"),
        col("v").as("q_v"), col("nrm").as("q_nrm"))
      // multi-probe: own bucket + all 1-bit flips
      .withColumn("probe", explode(array(
        col("bucket") +: (0 until np).map(p =>
          col("bucket").bitwiseXOR(lit(1L << p))): _*)))
      .drop("bucket")
    val scored = bucketed.filter(col("vec_id") >= 5)
      .join(broadcast(queries), col("bucket") === col("probe"))
      .withColumn("score", round(
        when(col("nrm") === 0.0 || col("q_nrm") === 0.0, 0.0)
          .otherwise(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm"))), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Per-label centroid-cosine outlier screen — embedding QA's "does
    * this vector belong with its label" report: cosine of every
    * vector against its OWN label's (6-dp-rounded) centroid, flagged
    * below `tau`. Catches mislabeled / corrupted / off-distribution
    * embeddings before they poison contrastive training or skew the
    * IVF quantizer cells built from the same centroids.
    *
    * 100 TB notes: the centroid table is labels×dims (tiny,
    * broadcast); the corpus pass is one map with a 64-term dot
    * product per row — the only corpus-keyed exchange is the
    * centroid aggregation itself, which map-side combines.
    */
  def centroidOutliers(spark: SparkSession, sfDir: String,
      tau: Double = 0.2): DataFrame = {
    val cents = labelCentroids(spark, sfDir)
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("d"), col("centroid")))),
        s => s.getField("centroid")).as("cvec"))
    embWithNorm(spark, sfDir)
      .join(broadcast(cents), Seq("label"))
      .withColumn("cnrm", norm(col("cvec")))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        round(when(col("nrm") === 0.0 || col("cnrm") === 0.0, 0.0)
          .otherwise(dot(col("v"), col("cvec")) / (col("nrm") * col("cnrm"))),
          6).as("cos_centroid"))
      .withColumn("is_outlier", (col("cos_centroid") < tau).cast("int"))
      .orderBy(col("vec_id"))
  }

  /** ANN quality evaluation — recall@k of the multi-probe LSH index
    * ([[annLsh]]) against the exact top-k ([[topkBruteforce]]), per
    * query. The eval loop every production vector index ships with:
    * recall is THE dial that justifies (or vetoes) replacing the
    * brute-force path, and it must be measured on the same engine
    * that serves the index.
    *
    * 100 TB notes: composes the two existing plans — the ANN side's
    * k·|Q| rows broadcast into a semi-match against the exact side's
    * k·|Q| rows; the eval adds nothing corpus-sized beyond its two
    * inputs (and on a real deployment the exact side runs on a
    * sampled query panel, which is exactly this shape).
    */
  def recallEval(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val exact = topkBruteforce(spark, sfDir, k)
      .select(col("q_id"), col("vec_id"))
    val ann = annLsh(spark, sfDir, k)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    exact.join(broadcast(ann), Seq("q_id", "vec_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(count(col("hit")).as("n_hit"))
      .select(col("q_id"), col("n_hit"),
        (round(col("n_hit").cast("double") / k, 6) + lit(0.0)).as("recall_at_k"))
      .orderBy(col("q_id"))
  }

  /** Hyperplane-LSH TUNING CURVE — the index-parameter sweep next to
    * [[recallEval]]'s single operating point (and the hyperplane twin
    * of the MinHash banding curve `Dedup.lshTuningCurve`): for every
    * (plane count, probe radius) on the grid, the measured recall@k
    * against the exact top-k AND the measured candidate volume. This
    * is the table an operator reads to pick the accuracy/cost
    * operating point: planes cut candidates exponentially but cost
    * recall; Hamming-1 multi-probe buys most of it back at
    * (planes+1)× probe volume.
    *
    * On isotropic-noise embeddings recall is near zero BY
    * CONSTRUCTION (no neighbor structure exists to find) — the curve
    * is still exactly oracle-checked; on the clustered ScaleGen
    * corpora (k centers + noise) the same sweep exhibits the ≥0.8
    * operating points, which is where the parameters get chosen.
    *
    * 100 TB notes: the exact side is the [[topkBruteforce]] broadcast
    * pass computed ONCE and shared by every grid cell; each cell adds
    * one corpus map (bucket bits) + one broadcast probe join whose
    * candidate volume is the very quantity being measured. Grid cells
    * union as independent branches — nothing quadratic, nothing
    * corpus-keyed beyond the scans.
    */
  def annTuning(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val exact = topkBruteforce(spark, sfDir, k)
      .select(col("q_id"), col("vec_id")).localCheckpoint(true)
    val emb = embWithNorm(spark, sfDir)
    val grid = for (p <- Seq(6, 10, 14); h <- Seq(0, 1, 2)) yield (p, h)
    grid.map { case (np, h) =>
      val bucket = (0 until np).map { p =>
        val proj = dot(col("v"),
          array((0 until 64).map(d => lit(planeComponent(p, d))): _*))
        when(proj >= 0.0, lit(1L << p)).otherwise(0L)
      }.reduce((x, y) => x.bitwiseOR(y))
      val bucketed = emb.withColumn("bucket", bucket)
      val masks = (0L until (1L << np))
        .filter(m => java.lang.Long.bitCount(m) <= h)
      val probeCols = array(masks.map(m =>
        col("bucket").bitwiseXOR(lit(m))): _*)
      val queries = bucketed.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("q_v"),
          col("nrm").as("q_nrm"), explode(probeCols).as("probe"))
      val cand = bucketed.filter(col("vec_id") >= 5)
        .join(broadcast(queries), col("bucket") === col("probe"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("vec_id"))
      val ann = cand
        .withColumn("score", round(
          when(col("nrm") === 0.0 || col("q_nrm") === 0.0, 0.0)
            .otherwise(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm"))),
          6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      val recall = exact.join(broadcast(ann), Seq("q_id", "vec_id"), "left_outer")
        .groupBy(col("q_id")).agg(count(col("hit")).as("n_hit"))
        .agg(round(avg(col("n_hit").cast("double") / k), 6).as("mean_recall"))
      val volume = cand.agg(count(lit(1)).as("total_candidates"))
      recall.crossJoin(volume)
        .select(lit(np.toLong).as("n_planes"), lit(h.toLong).as("probe_hamming"),
          (col("mean_recall") + lit(0.0)).as("mean_recall"),
          col("total_candidates"))
    }.reduce(_.unionByName(_))
      .orderBy(col("n_planes"), col("probe_hamming"))
  }

  /** Pairwise-cosine HISTOGRAM over a deterministic pair sample
    * (consecutive vec_ids) — the embedding-space shape check next to
    * [[pcaPower]]'s anisotropy number: a healthy space puts random
    * pairs near 0, collapse piles them near 1, and a bimodal shape
    * betrays mixed distributions (e.g. two encoders' outputs
    * concatenated). Adjacent-id pairing is the deterministic stand-in
    * for random sampling (ids carry no semantic order), giving N−1
    * pairs from one KEYED self-join — never an all-pairs cross.
    *
    * 100 TB notes: the join keys on vec_id+1 (equi-join, not a
    * cross); scores bin at the scan and collapse map-side to ≤21
    * buckets — nothing pair-sized survives the exchange.
    */
  def cosHist(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = e.select(col("vec_id"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select((col("vec_id") - 1).as("vec_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("vec_id"))
      .select(round(
        when(col("na") === 0.0 || col("nb") === 0.0, 0.0)
          .otherwise(dot(col("va"), col("vb")) / (col("na") * col("nb"))), 6)
        .as("cos"))
      .select(floor(col("cos") * 10).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("bucket"))
  }

  /** Dimension-truncation recall eval (the Matryoshka-representation
    * serving dial, Kusupati et al. 2022): recall@k of top-k retrieval
    * over the FIRST `keepDims` dimensions against the full-dimension
    * exact top-k — the number that decides whether serving can ship
    * d/4-sized vectors (4× memory/bandwidth) for this corpus. Sits
    * next to [[recallEval]] (index-approximation dial) and
    * [[quantizeInt8]] (precision dial) in the embedding-QA family.
    *
    * 100 TB notes: composes two broadcast-query scoring passes over
    * the same corpus scan — the truncated pass reads the SAME column
    * and slices in-row, so no second copy of the vectors exists
    * anywhere; the k·|Q| truncated top-k broadcasts into the exact
    * side exactly like [[recallEval]].
    */
  /** Binary (sign-bit) quantization recall (SparkEntry
    * `embed_binary_recall`) — the most aggressive embedding
    * compression dial, next to [[quantizeInt8]] and [[dimRecall]]:
    * each dimension keeps ONE bit (its sign), a 32× storage/bandwidth
    * cut, and retrieval ranks by Hamming agreement. This query
    * MEASURES what that buys: recall@k of the sign-bit ranking
    * against the exact-cosine top-k — the number a team reads before
    * switching its 100 TB vector store to binary embeddings.
    *
    * Determinism end-to-end in integers: signs are ±1, the agreement
    * score is a ±1 dot product (an exact small-integer double — no
    * rounding contract needed), ties rank by vec_id.
    *
    * 100 TB shape: signing is a pure per-row map at the scan; the
    * score pass is the same broadcast-queries × corpus map as
    * [[topkBruteforce]] (in production the ±1 dot compiles to
    * XOR+popcount over packed words — the plan shape is identical);
    * per-query top-k via window over q_id like the recall-eval
    * family.
    */
  def binaryRecall(spark: SparkSession, sfDir: String, k: Int = 10)
      : DataFrame = {
    val exact = topkBruteforce(spark, sfDir, k)
      .select(col("q_id"), col("vec_id"))
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(toDouble(col("embedding")),
          x => when(x >= 0.0, lit(1.0)).otherwise(lit(-1.0))).as("b"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("b").as("q_b"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val ham = emb.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(queries))
      .withColumn("score", dot(col("b"), col("q_b")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    val nd = Tables.embeddings(spark, sfDir)
      .agg(max(size(col("embedding"))).cast("long").as("n_dims"))
    exact.join(broadcast(ham), Seq("q_id", "vec_id"), "left_outer")
      .groupBy(col("q_id")).agg(count(col("hit")).as("n_hit"))
      .crossJoin(broadcast(nd))
      .select(col("q_id"), col("n_dims"), col("n_hit"),
        (round(col("n_hit").cast("double") / k, 6) + lit(0.0))
          .as("recall_at_k"))
      .orderBy(col("q_id"))
  }

  /** Packed-word binary Hamming retrieval (SparkEntry
    * `sim_hamming_topk`) — the PRODUCTION spelling of what
    * [[binaryRecall]] evaluates: sign bits pack into 32-bit halves of
    * BIGINT words IN-ROW (a fold over the vector, zero exchanges —
    * dims > 64 would add ⌈d/32⌉ words, same plan), and retrieval is
    * XOR + popcount per word — the instruction-level kernel every
    * billion-vector binary index runs. Top-k per query by
    * (hamming asc, vec_id): all-integer arithmetic, no rounding
    * contract anywhere.
    *
    * 100 TB shape: packing is a pure per-row map at the scan (the
    * corpus's 64-float vectors leave the scan as TWO longs — a 32×
    * bandwidth cut before any exchange); scoring is the
    * broadcast-queries map of the brute-force family over those
    * longs; per-query top-k via the recall-eval window.
    */
  /** Sign-bit packing shared by [[hammingTopk]] and [[hammingTuning]]
    * (and mirrored by both DuckDB oracles): ⌈dims/32⌉ packed BIGINT
    * words as one `array<bigint>` column — word `wi` holds dims
    * [wi·32, wi·32+32), bit `d mod 32` set when dim d's value ≥ 0.
    * An in-row fold, zero exchanges at ANY dimensionality (the R10
    * two-word form capped dims at 64; real embedding dims are
    * 256–1024). A short final slice zero-fills via the null guard.
    */
  private[graft] def signCodesOn(emb: DataFrame): DataFrame = {
    val pack =
      "transform(sequence(0, (size(embedding) + 31) div 32 - 1), wi -> " +
        "aggregate(zip_with(" +
        "slice(cast(embedding as array<double>), wi * 32 + 1, 32), " +
        "sequence(0, 31), " +
        "(x, d) -> case when x is not null and x >= cast(0 as double) " +
        "then shiftleft(1L, d) else 0L end), 0L, (a, b) -> a + b))"
    emb.select(col("vec_id"), expr(pack).as("words"))
  }

  private def signCodes(spark: SparkSession, sfDir: String): DataFrame =
    signCodesOn(Tables.embeddings(spark, sfDir))

  /** Packed-word Hamming distance between two equal-length word-array
    * columns: per-word XOR + popcount, summed in-row. The
    * instruction-level kernel of every billion-vector binary index,
    * spelled over `zip_with`/`aggregate` so it rides whole-stage
    * codegen.
    */
  private def hammingExpr(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, " +
      "(x, y) -> cast(bit_count(x ^ y) as bigint)), 0L, (s, v) -> s + v)")

  def hammingTopk(spark: SparkSession, sfDir: String, k: Int = 10)
      : DataFrame =
    hammingTopkOn(signCodes(spark, sfDir), k)

  /** [[hammingTopk]] over a precomputed [[signCodesOn]] frame (spec
    * seam for non-testdata dimensionalities, e.g. dims = 128).
    */
  private[graft] def hammingTopkOn(codes: DataFrame, k: Int): DataFrame = {
    val queries = codes.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("words").as("q_words"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming"), col("vec_id"))
    codes.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(queries))
      .withColumn("hamming", hammingExpr("words", "q_words"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("hamming"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Hamming-radius tuning curve (SparkEntry `sim_hamming_tuning`) —
    * the binary-retrieval dial next to the LSH plane/probe and IVF
    * nprobe curves: per candidate radius r, the measured recall@k of
    * "keep everything within Hamming r of the query's sign code" and
    * the candidate volume that radius admits — the table a team reads
    * to pick the filter radius before the exact re-rank pass.
    *
    * 100 TB shape: ONE scoring pass (the [[hammingTopk]] packed-word
    * map) feeds every grid cell as conditional partial sums inside a
    * single map-side-combined aggregate — the radius grid adds zero
    * exchanges and zero extra passes; the 5-row curve unpivots from
    * the one aggregate row.
    */
  def hammingTuning(spark: SparkSession, sfDir: String, k: Int = 10,
      radii: Seq[Int] = Seq(8, 12, 16, 20, 24)): DataFrame = {
    val exact = topkBruteforce(spark, sfDir, k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("ex"))
    val codes = signCodes(spark, sfDir)
    val queries = codes.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("words").as("q_words"))
    val nQ = 5
    val scored = codes.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(queries))
      .withColumn("hamming", hammingExpr("words", "q_words"))
      .join(broadcast(exact), Seq("q_id", "vec_id"), "left_outer")
    val cells = radii.flatMap(r => Seq(
      sum(when(col("hamming") <= r, 1L).otherwise(0L)).as(s"c$r"),
      coalesce(sum(when(col("hamming") <= r, col("ex"))), lit(0L))
        .as(s"h$r")))
    scored.agg(cells.head, cells.tail: _*)
      .selectExpr(s"stack(${radii.size}, " +
        radii.map(r => s"${r}L, c$r, h$r").mkString(", ") +
        ") as (radius, n_candidates, n_hits)")
      .select(col("radius"), col("n_candidates"), col("n_hits"),
        (round(col("n_hits").cast("double") / (k * nQ), 6) + lit(0.0))
          .as("mean_recall"))
      .orderBy(col("radius"))
  }

  def dimRecall(spark: SparkSession, sfDir: String, k: Int = 10,
      keepDims: Int = 16): DataFrame = {
    val exact = topkBruteforce(spark, sfDir, k)
      .select(col("q_id"), col("vec_id"))
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        slice(toDouble(col("embedding")), 1, keepDims).as("v"))
      .withColumn("nrm", norm(col("v")))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val truncated = emb.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(queries))
      .withColumn("score", round(
        when(col("nrm") === 0.0 || col("q_nrm") === 0.0, 0.0)
          .otherwise(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm"))), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    exact.join(broadcast(truncated), Seq("q_id", "vec_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(count(col("hit")).as("n_hit"))
      .select(col("q_id"), lit(keepDims.toLong).as("kept_dims"),
        col("n_hit"),
        (round(col("n_hit").cast("double") / k, 6) + lit(0.0))
          .as("recall_at_k"))
      .orderBy(col("q_id"))
  }

  /** Top principal component of the embedding corpus by power
    * iteration over the (mean-centered) covariance — the
    * anisotropy/collapse screen run next to [[dimStats]]: a single
    * direction hoarding most of the variance means the embedding
    * space has collapsed (Ethayarajh 2019's anisotropy observation)
    * and cosine similarities are dominated by one axis.
    *
    * Per iteration, `w = Σ_i c_i (c_i · v)` — i.e. `N·Cov·v` without
    * ever materializing the d×d covariance — then v normalizes,
    * sign-fixed so the first nonzero component is positive (power
    * iteration is sign-ambiguous; the fix makes it deterministic).
    * Output per dimension: the centered mean, the top-PC loading, and
    * constant `lambda` (top eigenvalue ≈ ‖w‖/N at convergence) /
    * `var_share` (λ / total variance) columns.
    *
    * Determinism: the mean is 6-dp decimal-exact ([[dimStats]]'s
    * pattern); each per-row product `c_d·s` rounds to 12 dp and
    * accumulates as DECIMAL(38,12) (order-independent); the
    * normalize step divides by an in-row ordered fold ‖w‖ and
    * re-rounds to 9 dp — so the DuckDB oracle (iterations unrolled
    * as CTEs) reproduces every double bit-for-bit.
    *
    * 100 TB notes: v and μ are dims-sized BROADCAST one-row frames;
    * each iteration pays one dims-keyed exchange of 12-dp partials
    * with map-side combine (same shape as [[dimStats]]) — per-iter
    * cost is linear in corpus size and independent of iteration
    * count; nothing is ever collected to the driver.
    */
  def pcaPower(spark: SparkSession, sfDir: String, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // per-dim 6-dp decimal-exact means, folded to a one-row array
    val muPerDim = e.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(round(sum(col("x").cast("decimal(28,12)")).cast("double")
        / count(lit(1)), 6).as("m"))
    val mu = muPerDim
      .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
        s => s.getField("m")).as("mu"))
    // spread the centered matrix at session parallelism: every power
    // iteration (and the variance pass) maps over it, and a narrow
    // checkpoint pinned those stages to the scan's width (observed
    // 1-task 200 ms map stages per iteration at sf0.1)
    val cent = e.crossJoin(broadcast(mu))
      .select(col("vec_id"), zip_with(col("v"), col("mu"), _ - _).as("c"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("vec_id"))
      .localCheckpoint()
    val nRows = cent.count()
    // The iterated state is ONE d-element vector — an O(d) value
    // independent of the corpus size — so each round collects it and
    // feeds the next round as a literal (r18 optimization round): one
    // distributed aggregation job per iteration instead of a
    // broadcast-plan + 1-row checkpoint chain (measured ~2× on the
    // query; a bounded driver action by the same O(1)/O(d) rule as
    // the loud-guard collects). Every Spark-side expression below is
    // unchanged, so the arithmetic the oracle unrolls is bit-identical.
    val d = cent.select(size(col("c"))).head().getInt(0)
    // v0: uniform unit vector (deterministic, never orthogonal to the
    // top PC in practice; dims from the data, no hardcoding) — same
    // IEEE value as the former lit(1.0)/sqrt(cast(d)) column
    var pvArr: Array[Double] = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lastNrm = 0.0
    for (_ <- 1 to iters) {
      val w = cent
        .select(posexplode(col("c")).as(Seq("d", "cx")),
          dot(col("c"), typedLit(pvArr)).as("s"))
        .select(col("d"), round(col("cx") * col("s"), 12).as("t"))
        .groupBy(col("d"))
        .agg(sum(col("t").cast("decimal(38,12)")).cast("double").as("w"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("w")))),
          s => s.getField("w")).as("wv"))
      val n = w.select(col("wv"), sqrt(dot(col("wv"), col("wv"))).as("nrm"))
      // sign-fix BEFORE the rounding divide: both engines flip the
      // same doubles, so the rounded quotients agree exactly
      val adj = when(
        coalesce(element_at(filter(col("wv"), x => x =!= 0.0), 1),
          lit(0.0)) < 0,
        transform(col("wv"), x => -x)).otherwise(col("wv"))
      val row = n.select(col("nrm"),
        when(col("nrm") === 0.0, col("wv"))
          .otherwise(transform(adj, x => round(x / col("nrm"), 9))).as("pv"))
        .head()
      lastNrm = row.getDouble(0)
      pvArr = row.getSeq[Double](1).toArray
    }
    val pv = spark.range(1).select(typedLit(pvArr).as("pv"))
    val lam = spark.range(1).select(
      round(lit(lastNrm) / nRows.toDouble, 6).as("lambda"))
    val totvar = cent
      .select(explode(col("c")).as("cx"))
      .select(round(col("cx") * col("cx"), 12).as("t"))
      .agg((sum(col("t").cast("decimal(38,12)")).cast("double")
        / nRows.toDouble).as("tv"))
    muPerDim
      .crossJoin(broadcast(pv.select(posexplode(col("pv")).as(Seq("pd", "loading")))))
      .filter(col("d") === col("pd"))
      .crossJoin(broadcast(lam))
      .crossJoin(broadcast(totvar))
      .select(col("d").cast("long").as("d"),
        (col("m") + lit(0.0)).as("mean"),
        (col("loading") + lit(0.0)).as("loading"),
        col("lambda"),
        when(col("tv") === 0.0, lit(0.0))
          .otherwise(round(col("lambda") / round(col("tv"), 6), 6)).as("var_share"))
      .orderBy(col("d"))
  }
}
