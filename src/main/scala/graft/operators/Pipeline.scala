package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pretraining-corpus pipeline summaries — the shape of
  * job a training-data curation run finishes with: how many documents
  * survived each gate and how many tokens the kept corpus holds.
  */
object Pipeline {

  /** One-row corpus summary: total docs, docs passing the quality
    * gate, exact-unique docs, and whitespace/BPE-ish token totals.
    * Three independent single-row aggregates cross-joined — the
    * quality and token ones are pure map-side-combined scan
    * aggregations; only the distinct-hash count pays a keyed shuffle
    * (of 16-byte hashes, the unavoidable cost of an exact distinct).
    */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame = {
    val quality = TextAnalysis.quality(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"))
    val tokens = TextAnalysis.tokens(spark, sfDir)
      .agg(sum(col("ws_tokens")).as("ws_tokens_total"),
        sum(col("bpe_tokens")).as("bpe_tokens_total"))
    val unique = Tables.documents(spark, sfDir)
      .agg(count_distinct(md5(col("text"))).as("n_unique"))
    quality.crossJoin(unique).crossJoin(tokens)
      .select(col("n_docs"), col("n_kept"), col("n_unique"),
        col("ws_tokens_total"), col("bpe_tokens_total"))
  }

  /** Deterministic stratified downsampling: each language stratum is
    * thinned to ~`cap` documents by a hash threshold instead of
    * `sample()` — reruns pick the SAME rows (training-data pipelines
    * need reproducible subsets), and the decision is a pure function
    * of (doc_id, stratum size), so the DuckDB oracle mirrors it
    * exactly.
    *
    * Keep rule: `h(doc_id) * n_lang < cap * P` with
    * `h = (A·(id mod P) + B) mod P` ([[graft.OracleHash]] family) —
    * the division-free spelling of `h < P·(cap/n_lang)`, so both
    * engines evaluate pure 64-bit integer arithmetic (exact while
    * n_lang < 2^62/P ≈ 4.6e9 docs per stratum; both engines
    * overflow-CHECK beyond that, so the failure mode is loud). Plan:
    * one map-side-combined stratum count, broadcast back onto the
    * scan — no shuffle of the corpus itself, filter runs at the scan.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String, cap: Long = 40L): DataFrame = {
    import graft.OracleHash.{MulA, MulB, P}
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val h = (lit(MulA) * (col("doc_id") % lit(P)) + lit(MulB)) % lit(P)
    docs.join(broadcast(counts), Seq("lang"))
      .filter(col("n_lang") <= cap || h * col("n_lang") < lit(cap * P))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark-contamination screen: fraction of each corpus
    * document's distinct word-3-gram shingles that also occur in a
    * held-out benchmark set (here: every `benchMod`-th doc stands in
    * for the benchmark). The n-gram-overlap check is the standard
    * decontamination gate run before pretraining.
    *
    * Plan shape: shingling rides the document scan
    * ([[Dedup.docShingleHashes]] — per-doc JVM loop, no exchange ever
    * carries text); the benchmark's distinct shingle hashes are a
    * left-semi join key (8 B per shingle, broadcast when the
    * benchmark is small — the usual case: benchmarks are MBs, corpora
    * are TBs); the per-doc overlap count is one keyed shuffle of
    * (doc_id, hash) pairs.
    */
  def contamination(spark: SparkSession, sfDir: String, benchMod: Long = 97L,
      tau: Double = 0.05): DataFrame = {
    val docs = Dedup.docShingleHashes(spark, sfDir)
    val bench = docs.filter(col("doc_id") % benchMod === 0)
      .select(explode(col("shh")).as("h")).distinct()
    val corpus = docs.filter(col("doc_id") % benchMod =!= 0)
    val hits = corpus.select(col("doc_id"), explode(col("shh")).as("h"))
      .join(bench, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val frac = when(col("n_shingles") === 0, lit(0.0))
      .otherwise(round(col("n_overlap").cast("double") / col("n_shingles"), 6))
    corpus.select(col("doc_id"), col("n_sh").cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        frac.as("contamination"),
        (col("n_shingles") > 0 &&
          col("n_overlap").cast("double") / col("n_shingles") >= tau)
          .cast("long").as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Domain-mixture sampling weights: per-source token counts scaled
    * by a temperature exponent `alpha` and normalized — the standard
    * recipe for re-balancing pretraining sources (alpha = 1
    * reproduces natural proportions; alpha < 1 up-weights small
    * domains, the multilingual-sampling trick).
    *
    * Determinism: token totals are exact integers; `pow` and the
    * normalizing division are done in double on the 6-dp-rounded
    * shares, and the output weight is rounded to 6 dp on both
    * engines, which dwarfs any last-ulp `pow` divergence.
    *
    * 100 TB notes: one map-side-combined aggregation to |sources|
    * rows (single tiny keyed shuffle); the weights frame is
    * broadcast-sized by construction — the expensive corpus never
    * moves.
    */
  def mixWeights(spark: SparkSession, sfDir: String, alpha: Double = 0.5): DataFrame = {
    val nTok = when(length(trim(col("text"))) === 0, lit(0L))
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val perSource = Tables.documents(spark, sfDir)
      .select(col("source"), nTok.as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
    val scaled = pow(col("tokens").cast("double"), lit(alpha))
    val total = perSource.agg(
      round(sum(pow(col("tokens").cast("double"), lit(alpha))), 6).as("z"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(round(scaled, 6) / col("z"), 6).as("weight"))
      .orderBy(col("source"))
  }

  /** Deterministic train/val/test split assignment (90/5/5): the
    * split is a pure function of `doc_id` through the
    * [[graft.OracleHash]] multiply-add hash, so reruns, retries, and
    * other engines (the DuckDB twin) assign every document to the
    * SAME split — the reproducibility property a training pipeline
    * needs from its holdout carve.
    *
    * 100 TB notes: a pure per-row map at the scan — zero exchanges,
    * no corpus count, no sampling state. The ORDER BY in the declared
    * query is presentation only.
    */
  def trainSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.OracleHash.{MulA, MulB, P}
    val bucket = ((lit(MulA) * (col("doc_id") % lit(P)) + lit(MulB)) % lit(P)) % 100L
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(bucket < 90L, lit("train"))
          .when(bucket < 95L, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy(col("doc_id"))
  }

  /** Budget-constrained greedy selection — "the best documents that
    * fit N tokens": docs admit in (quality score desc, doc_id) order
    * until the token budget is exhausted, WITHOUT ever globally
    * sorting the corpus. The score histogram (bounded integer domain
    * — [[TextAnalysis.qualityModel]]'s hashed-BoW scores) cumsums on
    * a tiny frame to find each bucket's budget headroom, whole
    * buckets admit or reject wholesale, and only the boundary
    * bucket's members run the within-bucket prefix rule. Kept token
    * mass never exceeds the budget, and the selection is maximal
    * under the greedy order.
    *
    * 100 TB notes: the only corpus-scale exchange is the scoring
    * aggregate — the global cumsum runs over the score HISTOGRAM
    * (|distinct integer scores| rows), never the corpus, and the
    * within-bucket prefix window runs ONLY over the single boundary
    * bucket's rows (all other buckets decide wholesale from the
    * broadcast histogram, a pure map). The shape that replaces
    * "ORDER BY score LIMIT-until-budget" at scale.
    */
  def budgetSelect(spark: SparkSession, sfDir: String,
      budget: Long = 10000L): DataFrame = {
    val qd = TextAnalysis.qualityModel(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val hist = qd.groupBy(col("score"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // bucket triage on the HISTOGRAM (|distinct scores| rows): a
    // bucket that fits entirely under the remaining budget admits
    // wholesale (every prefix of it fits too), one that starts past
    // the budget rejects wholesale, and AT MOST ONE bucket straddles
    // the boundary (cum_before is monotone in the greedy order) —
    // only ITS members pay the within-bucket prefix rule
    val cum = hist
      .withColumn("cum_before",
        coalesce(sum(col("bucket_tokens")).over(wDesc), lit(0L)))
      .withColumn("bucket_keep",
        when(col("cum_before") + col("bucket_tokens") <= budget, lit(1))
          .when(col("cum_before") > budget, lit(0))
          .otherwise(lit(2)))
      .select(col("score"), col("cum_before"), col("bucket_keep"))
    val joined = qd.join(broadcast(cum), Seq("score"))
    val wholesale = joined.filter(col("bucket_keep") =!= 2)
      .select(col("doc_id"), col("score"), col("n_tokens"),
        col("bucket_keep").as("keep"))
    val wInBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("score")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val boundary = joined.filter(col("bucket_keep") === 2)
      .withColumn("run_inc", sum(col("n_tokens")).over(wInBucket))
      .select(col("doc_id"), col("score"), col("n_tokens"),
        ((col("cum_before") + col("run_inc")) <= budget).cast("int").as("keep"))
    wholesale.unionByName(boundary).orderBy(col("doc_id"))
  }

  /** Deterministic epoch-keyed GLOBAL SHUFFLE + shard layout — the
    * training-reader data-ordering step: every epoch permutes the
    * corpus pseudorandomly (epoch e draws each doc's key from
    * [[graft.OracleHash]] permutation e, so epochs reshuffle without
    * any stored state) and lays it out as `n_shards` shards with a
    * dense within-shard position, which is exactly what a
    * data-parallel reader fleet consumes (reader r streams shard r in
    * pos order). Rerun-stable and engine-reproducible; two epochs
    * reported side by side to pin the reshuffling property.
    *
    * 100 TB notes: a true global sort is the naive spelling and dies
    * first at scale — this is hash-keys + PER-SHARD windows: one
    * shard-keyed exchange per epoch carrying (doc_id, key) pairs
    * only, each shard's position numbering independent and parallel.
    * Shard count = reader parallelism, so the layout IS the consumer
    * partitioning.
    */
  def globalShuffle(spark: SparkSession, sfDir: String,
      nShards: Int = 8): DataFrame = {
    import graft.OracleHash.P
    def key(epoch: Int): Column =
      (lit(graft.OracleHash.a(epoch)) * (col("doc_id") % lit(P)) +
        lit(graft.OracleHash.b(epoch))) % lit(P)
    def w(shard: String, k: String) = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shard)).orderBy(col(k), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), key(1).as("k1"), key(2).as("k2"))
      .withColumn("shard_e1", col("k1") % nShards)
      .withColumn("shard_e2", col("k2") % nShards)
      .withColumn("pos_e1",
        row_number().over(w("shard_e1", "k1")).cast("long"))
      .withColumn("pos_e2",
        row_number().over(w("shard_e2", "k2")).cast("long"))
      .select(col("doc_id"), col("shard_e1"), col("pos_e1"),
        col("shard_e2"), col("pos_e2"))
      .orderBy(col("doc_id"))
  }

  /** Weighted sampling without replacement, probability ∝ token
    * count, in PURE INTEGER arithmetic: each doc draws the uniform
    * hash `h = (A·(id mod P)+B) mod P` and competes on the priority
    * key `h div weight` — scaling the uniform key down by the weight
    * makes heavier docs win smaller keys proportionally (the
    * classic priority-sampling trick), with none of the
    * `u^(1/w)` float portability hazards of A-Res. The k smallest
    * (key, doc_id) win; fully deterministic and rerun-stable.
    *
    * 100 TB notes: key assignment is a per-row map at the scan;
    * selection is TakeOrdered (k rows per task cross the wire). The
    * rank window runs over the k survivors only.
    */
  def sampleWeighted(spark: SparkSession, sfDir: String,
      k: Int = 50): DataFrame = {
    import graft.OracleHash.{MulA, MulB, P}
    val tokens = when(length(trim(col("text"))) === 0, 0L)
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val h = (lit(MulA) * (col("doc_id") % lit(P)) + lit(MulB)) % lit(P)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), greatest(tokens, lit(1L)).as("weight"))
      .withColumn("key", floor(h / col("weight")).cast("long"))
      .orderBy(col("key"), col("doc_id")).limit(k)
      .select(row_number().over(w).cast("long").as("rank"),
        col("doc_id"), col("weight"), col("key"))
      .orderBy(col("rank"))
  }

  /** Sequence-packing plan: concatenate documents in deterministic
    * order and cut the stream into training chunks of `budget`
    * tokens (the GPT-style concat-and-chunk packing step). Each doc
    * gets its stream offset and the chunk its first token lands in.
    *
    * 100 TB notes: a single global concatenation order would be one
    * window over one partition — a driver-shaped bottleneck. Instead
    * the corpus is sharded by `doc_id mod shards` and each shard is
    * packed independently: the running-offset window partitions by
    * shard, so all 32 (or 32 000) shards pack in parallel and each
    * chunk id is (shard, chunk) — exactly how a multi-writer
    * tokenizer job lays out files. Raise `shards` with the cluster;
    * the plan shape is one hash exchange on the shard key.
    */
  def packChunks(spark: SparkSession, sfDir: String, budget: Long = 2048L,
      shards: Int = -1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // shard count IS the writer parallelism AND the per-shard window
    // bound (each shard sorts ~n/shards rows): default it to the
    // session's shuffle parallelism so the layout scales with the
    // cluster instead of a constant. Callers needing a pinned layout
    // (the oracle-compared declared query, reader fleets of a fixed
    // size) pass it explicitly.
    val nShards =
      if (shards > 0) shards
      else spark.sessionState.conf.numShufflePartitions
    val nTok = when(length(trim(col("text"))) === 0, lit(0L))
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("doc_id") % nShards).as("shard"),
        nTok.as("n_tok"))
      .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tok"), col("start_off"),
        floor(col("start_off") / budget.toDouble).as("chunk"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end curation decision: composes the quality gate
    * ([[TextAnalysis.qualityProjection]]) with duplicate clustering
    * ([[Dedup.dedupClusters]]) into one keep/drop verdict per
    * document with a reason — the last step of a corpus pipeline,
    * where per-doc signals become the actual train-set membership.
    * Rules: quality failure drops first; then any non-canonical
    * cluster member (canonical = min doc_id in its duplicate
    * cluster, chosen before the quality gate so the survivor set is
    * stable under gate-threshold changes).
    * 100 TB notes: adds exactly one doc_id-keyed join on top of its
    * two inputs — the quality side is a stateless scan projection and
    * the cluster side is the memoized [[Dedup.clusterArtifact]], so
    * the clustering is computed once per session, not per consumer.
    */
  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    val q = graft.operators.TextAnalysis
      .qualityProjection(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("keep").as("keep_q"))
    val clusters = Dedup.clusterArtifact(spark, sfDir)
    q.join(clusters, Seq("doc_id"))
      .select(col("doc_id"),
        when(col("keep_q") === 0, lit("quality"))
          .when(col("doc_id") =!= col("cluster"), lit("duplicate"))
          .otherwise(lit("kept")).as("reason"),
        (col("keep_q") === 1 && col("doc_id") === col("cluster"))
          .cast("int").as("keep"),
        col("cluster"))
      .orderBy(col("doc_id"))
  }

  /** Per-source document-length quantiles — the curation dashboard's
    * "what does each domain's length distribution look like" report.
    * Exact interpolated percentiles (Spark sorts each group's values);
    * 6-dp rounding absorbs interpolation ulp differences vs the
    * oracle's quantile_cont.
    * 100 TB notes: one shuffle on source (tens of groups); the exact
    * sort is per-group. At extreme group sizes the approx_percentile
    * sketch is the drop-in (same call shape, mergeable state, no
    * group sort) — kept exact here because the oracle must
    * hash-match.
    */
  def lengthQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val nTok = when(length(trim(col("text"))) === 0, lit(0L))
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    Tables.documents(spark, sfDir)
      .select(col("source"), nTok.as("n_tok"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(percentile(col("n_tok"), lit(0.25)), 6).as("p25"),
        round(percentile(col("n_tok"), lit(0.5)), 6).as("p50"),
        round(percentile(col("n_tok"), lit(0.75)), 6).as("p75"),
        round(percentile(col("n_tok"), lit(0.95)), 6).as("p95"),
        max(col("n_tok")).as("max_tok"))
      .orderBy(col("source"))
  }

  /** Overlapping sliding-window chunking — the RAG / long-context
    * preprocessing step that cuts each document into token windows of
    * `chunkTokens` advancing by `stride` (overlap = chunkTokens −
    * stride), materializing each chunk's text plus its token span.
    * Unlike [[packChunks]] (which concatenates ACROSS documents at a
    * hard budget), chunks here never cross a document boundary and
    * neighboring chunks share context — the retrieval-index layout,
    * not the pretraining-batch layout. Empty documents yield no
    * chunks; a final partial window is kept (min chunk = 1 token).
    *
    * Token windows are whitespace tokens (the corpus-wide
    * convention); chunk text is the slice re-joined with single
    * spaces, so runs of whitespace normalize — documented, and
    * mirrored exactly by the oracle's `list_slice` + `array_to_string`.
    *
    * 100 TB notes: chunk indexes come from `sequence()` exploded AT
    * THE SCAN — a pure per-row flatMap, zero exchanges, zero state;
    * every executor chunks its own partition of documents and the
    * output is written partition-local. No shuffle appears unless a
    * downstream op asks for one. At 100 TB this is the ideal shape:
    * the operator is embarrassingly parallel and its cost is exactly
    * one read + one write of the corpus.
    */
  def chunkDocs(spark: SparkSession, sfDir: String,
      chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      s"need 0 < stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    val toks = split(trim(col("text")), "\\s+")
    val n = when(length(trim(col("text"))) === 0, lit(0L))
      .otherwise(size(toks).cast("long"))
    // starts: 0, stride, 2·stride, … while start < n (last window may
    // be short); nChunks = 1 + ceil((n − chunk)/stride) for n > chunk.
    val lastIdx = when(n <= chunkTokens, lit(0L))
      .otherwise(floor((n - chunkTokens + stride - 1) / lit(stride.toLong)))
    Tables.documents(spark, sfDir)
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), toks.as("toks"), n.as("n_tok"),
        explode(sequence(lit(0L), lastIdx)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + chunkTokens, col("n_tok")).as("tok_end"),
        array_join(slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"),
          (least(col("chunk_idx") * stride + chunkTokens, col("n_tok"))
            - col("chunk_idx") * stride).cast("int")), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** DSIR-style importance sampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling",
    * arXiv:2302.03169): score every raw document by how much its
    * hashed-unigram distribution resembles a TARGET domain (here: the
    * `lang = targetLang` slice of the corpus standing in for the
    * high-quality target set), weight = Σ_tokens
    * log p̂_target(bucket) − log p̂_raw(bucket) with add-1 smoothing
    * over `dim` feature-hash buckets ([[graft.OracleHash]] family,
    * the same poly-31 → permutation-0 → mod-dim hashing as
    * [[TextAnalysis.qualityModel]]). `keep` = weight ≥ 0 ("more
    * target-like than raw"); top-k selection at a fixed token budget
    * composes with [[sampleWeighted]]'s integer-priority TakeOrdered.
    *
    * Determinism: per-bucket log-ratios are 6-dp-rounded doubles
    * (rounding absorbs the ≤1-ulp cross-libm `ln` spread), the
    * per-doc sum accumulates them as DECIMAL(28,12) — exact and
    * order-independent — and the final weight re-rounds (+0.0
    * normalizes −0.0), so the DuckDB oracle hashes identically.
    *
    * 100 TB notes: the bucket log-ratio table is `dim` rows —
    * BROADCAST (a real DSIR run fits its n-gram hash buckets in
    * memory the same way); token hashing rides the scan; the only
    * corpus-sized exchange is the doc_id-keyed weight sum with
    * map-side partials. Nothing scales with vocabulary.
    */
  def importanceSample(spark: SparkSession, sfDir: String, dim: Int = 256,
      targetLang: String = "en"): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val occ = importanceOccurrences(docs, dim)
    val lr = importanceLogRatios(spark, sfDir, dim, targetLang)
    val scored = occ.join(broadcast(lr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        (round(sum(col("lr").cast("decimal(28,12)")).cast("double"), 6)
          + lit(0.0)).as("weight"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        (coalesce(col("weight"), lit(0.0)) + lit(0.0)).as("weight"),
        (coalesce(col("weight"), lit(0.0)) >= 0).cast("int").as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Per-token-occurrence hashed feature buckets of a (doc_id, lang?,
    * text) frame — the tokenize→poly-31→permutation-0→mod-dim chain
    * shared by [[importanceSample]] and the streaming scorer
    * ([[graft.streaming.StreamingJobs.dsirScore]]), split out so the
    * two cannot drift. Works on batch AND streaming frames (the JVM
    * flatMap carries no state).
    */
  private[graft] def importanceOccurrences(docs: DataFrame, dim: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hasLang = docs.columns.contains("lang")
    val occ =
      if (hasLang)
        docs.select(col("doc_id"), col("lang"), col("text"))
          .as[(Long, String, String)]
          .flatMap { case (id, lang, t) =>
            Sketches.tokenPolysJvm(t).map { case (_, h) => (id, lang, h) }
          }.toDF("doc_id", "lang", "h")
      else
        docs.select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (id, t) =>
            Sketches.tokenPolysJvm(t).map { case (_, h) => (id, h) }
          }.toDF("doc_id", "h")
    occ.withColumn("bucket", Sketches.perm(0, col("h")) % dim).drop("h")
  }

  /** The trained DSIR artifact: per-bucket 6-dp target-vs-raw
    * log-likelihood ratios over `dim` hashed-unigram buckets — the
    * small frame a production run persists once and every scoring
    * job (batch or stream) broadcasts.
    */
  private[graft] def importanceLogRatios(spark: SparkSession, sfDir: String,
      dim: Int = 256, targetLang: String = "en"): DataFrame = {
    val occ = importanceOccurrences(Tables.documents(spark, sfDir), dim)
    val rawCnt = occ.groupBy(col("bucket")).agg(count(lit(1)).as("cnt_r"))
    val tgtCnt = occ.filter(col("lang") === targetLang)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt_t"))
    val tot = occ.agg(
      count(lit(1)).as("tot_r"),
      sum((col("lang") === targetLang).cast("long")).as("tot_t"))
    // all dim buckets, zero-count ones included: smoothing gives them
    // a (maximally negative) defined log-ratio too
    spark.range(dim.toLong).select(col("id").as("bucket"))
      .join(rawCnt, Seq("bucket"), "left")
      .join(tgtCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"), round(
        log((coalesce(col("cnt_t"), lit(0L)) + lit(1)).cast("double") /
          (col("tot_t") + lit(dim))) -
        log((coalesce(col("cnt_r"), lit(0L)) + lit(1)).cast("double") /
          (col("tot_r") + lit(dim))), 6).as("lr"))
  }

  /** Curation-funnel observability: how many documents survive each
    * Gopher gate, both STANDALONE (each rule applied alone) and
    * CUMULATIVE (rules applied in sequence — the actual pipeline
    * order), in one row. The standalone/cumulative split is what a
    * pipeline operator tunes thresholds with: a rule whose standalone
    * pass rate is high but whose cumulative step drops many docs is
    * correlated with an earlier gate, not the binding constraint.
    *
    * 100 TB notes: the Gopher projection is a stateless codegen'd
    * scan map; the funnel is ONE 1-row aggregate of integer flags
    * with map-side partials — the whole report costs a single pass,
    * no shuffle of anything document-sized.
    */
  def qualityFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val g = graft.operators.TextAnalysis
      .gopherProjection(Tables.documents(spark, sfDir))
    def s(c: org.apache.spark.sql.Column) = sum(c.cast("long"))
    val c1 = col("r_word_count")
    val c2 = c1 * col("r_mean_len")
    val c3 = c2 * col("r_symbol")
    val c4 = c3 * col("r_alpha")
    g.agg(
      count(lit(1)).as("n_docs"),
      s(col("r_word_count")).as("p_word_count"),
      s(col("r_mean_len")).as("p_mean_len"),
      s(col("r_symbol")).as("p_symbol"),
      s(col("r_alpha")).as("p_alpha"),
      s(col("r_stops")).as("p_stops"),
      s(c1).as("c_word_count"),
      s(c2).as("c_mean_len"),
      s(c3).as("c_symbol"),
      s(c4).as("c_alpha"),
      s(col("keep")).as("n_keep"))
  }
}
