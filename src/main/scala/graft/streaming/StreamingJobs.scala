package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming twins of the batch event operators (SURVEY
  * §2.2 #17-18). The batch versions in graft.operators.Events are the
  * oracle-checked truth; these run the same semantics incrementally:
  *
  *  - [[windowAgg]] is literally the same `window()` aggregation —
  *    Spark runs one plan shape in both modes; the watermark bounds
  *    state retention.
  *  - [[sessionize]] swaps the batch sort-based lag/cumsum for O(1)
  *    per-key state via flatMapGroupsWithState, which is what survives
  *    unbounded streams: state per user is one open session, emitted
  *    and dropped on gap expiry or event-time timeout.
  */
object StreamingJobs {

  /** Tumbling 1-hour window counts/sums with a 2-hour watermark.
    * Input must have (ts: timestamp, event_type: string,
    * value: double).
    */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Hopping 1-hour/15-minute window counts/sums with a 2-hour
    * watermark — the streaming twin of Events.hoppingWindow (same
    * `window(ts, win, slide)` expression, so the batch DuckDB oracle
    * certifies this plan's arithmetic). State: ≤4 open windows per
    * event type inside the watermark horizon; windows whose end
    * passes the watermark are finalized and dropped.
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming twin of exact dedup (graft.operators.Dedup.exact):
    * emit only the first document seen per content hash.
    * dropDuplicatesWithinWatermark holds per-hash state only until the
    * watermark passes, so dedup state is bounded by the watermark
    * horizon instead of the whole stream history — the only sane
    * memory contract for an unbounded corpus feed.
    * Input needs (ts: timestamp, text: string).
    */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming twin of the contamination screen
    * (graft.operators.Pipeline.contamination): incoming documents are
    * checked against a STATIC benchmark shingle set, collected once
    * per micro-batch into a single broadcast row and intersected
    * row-locally (`array_intersect`) — a completely STATELESS map, so
    * append mode works with zero streaming state and the memory
    * contract is just the benchmark set's size (decontamination
    * benchmarks are MBs; the corpus feed is the unbounded side).
    * The batch operator's explode + semi-join shape would need keyed
    * state per doc here; row-local intersection is the same math
    * with no state at all. Input needs (doc_id, shh: array<long> of
    * distinct shingle hashes, n_sh); output mirrors the batch schema.
    */
  def contamination(docs: DataFrame, benchHashes: DataFrame,
      tau: Double = 0.05): DataFrame = {
    val benchArr = benchHashes.agg(collect_set(col("h")).as("__bench"))
    docs.crossJoin(benchArr)
      .select(col("doc_id"), col("n_sh").cast("long").as("n_shingles"),
        size(array_intersect(col("shh"), col("__bench"))).cast("long")
          .as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(col("n_overlap").cast("double") / col("n_shingles"), 6))
          .as("contamination"),
        (col("n_shingles") > 0 &&
          col("n_overlap").cast("double") / col("n_shingles") >= tau)
          .cast("long").as("contaminated"))
  }

  /** Streaming twin of the quality gate + train/val/test router
    * (graft.operators.TextAnalysis.quality ∘ Pipeline.trainSplit):
    * the ingestion-side filter of a corpus feed — score each arriving
    * document, keep the passers, and stamp the deterministic split it
    * will land in (the downstream writer fans out on that column,
    * e.g. `writeStream.partitionBy("split")`). Both pieces are pure
    * stateless projections (the split is the OracleHash bucket of
    * doc_id), so append mode needs ZERO streaming state and the
    * stream twin is literally the batch expressions re-applied.
    * Input needs (doc_id, text).
    */
  def qualityRoute(docs: DataFrame): DataFrame = {
    import graft.OracleHash.{MulA, MulB, P}
    val bucket = ((lit(MulA) * (col("doc_id") % lit(P)) + lit(MulB)) % lit(P)) % 100L
    graft.operators.TextAnalysis.qualityProjection(docs)
      .filter(col("keep") === 1)
      .withColumn("split",
        when(bucket < 90L, lit("train"))
          .when(bucket < 95L, lit("val"))
          .otherwise(lit("test")))
  }

  /** Gopher-rule router: the batch-certified
    * [[graft.operators.TextAnalysis.gopherProjection]] running
    * unchanged over a document stream (stateless projection + filter
    * — zero state, append mode), keeping only rule-passing docs.
    */
  def gopherRoute(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.gopherProjection(docs)
      .filter(col("keep") === 1)

  /** Model-based classifier gate over a document stream: each record
    * is scored in-process with the [[graft.operators.TextAnalysis
    * .qualityModel]] arithmetic (model weights ride the task closure
    * — the way a production fastText-style filter ships its model to
    * executors: broadcast once, score per record), keep = sign.
    * Stateless map + filter, zero streaming state, append mode. The
    * batch operator's DuckDB oracle certifies the arithmetic;
    * StreamingJobsSpec pins stream == batch on shared input. Input
    * needs (doc_id, text).
    */
  def classifierRoute(docs: DataFrame, dim: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val (n, s) = graft.operators.TextAnalysis.modelScoreJvm(t, dim)
        (id, n, s, if (s >= 0L) 1 else 0)
      }
      .toDF("doc_id", "n_tokens", "score", "keep")
      .filter(col("keep") === 1)
  }

  /** Windowed HLL distinct-token registers over a document stream —
    * the streaming half of [[graft.operators.Sketches.hllDistinctOn]].
    * Emits per tumbling hour the (bucket, m_j) REGISTER STATE (the
    * mergeable sketch itself, not the finalized number): one row per
    * non-empty bucket, `m_j` the max rho observed. Downstream merges
    * registers bucket-wise-max across windows/streams and finalizes
    * with `Sketches.hllEstimate` — the emit-state/merge-downstream
    * shape production sketch pipelines use, and it keeps this a
    * SINGLE streaming aggregation (finalizing in-stream would chain
    * two stateful aggs). State is bounded: m buckets per open window,
    * closed by the watermark. StreamingJobsSpec pins that the
    * streamed registers equal the batch operator's registers on the
    * same documents, so the batch oracle certifies this path too.
    * Input must have (ts: timestamp, text: string).
    */
  def hllRegisters(docs: DataFrame, m: Int = 128): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("ts"), col("text")).as[(Timestamp, String)]
      .flatMap { case (ts, t) =>
        graft.operators.Sketches.tokenPolysJvm(t).map(p => (ts, p._2)) }
      .toDF("ts", "h")
    val (bucket, rho) = graft.operators.Sketches.hllObservations(
      graft.operators.Sketches.perm(0, col("h")), m)
    toks
      .select(col("ts"), bucket.as("bucket"), rho.as("rho"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(max(col("rho")).as("m_j"))
      .select(col("window.start").as("window_start"), col("bucket"),
        col("m_j"))
  }

  /** Windowed count-min sketch cells over a document stream — the
    * streaming half of [[graft.operators.Sketches.cmsTopkOn]], same
    * emit-state/merge-downstream contract as [[hllRegisters]]: per
    * tumbling hour, (i, cell, ccnt) partial counts over d·w bounded
    * cells. Cells merge across windows/streams by ADDITION (the CMS
    * merge), after which the min-over-depth lookup estimates any
    * token's frequency. Single streaming aggregation; state is
    * ≤ d·w rows per open window regardless of stream volume.
    */
  def cmsRegisters(docs: DataFrame, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("ts"), col("text")).as[(Timestamp, String)]
      .flatMap { case (ts, t) =>
        graft.operators.Sketches.tokenPolysJvm(t).map(p => (ts, p._2)) }
      .toDF("ts", "h")
    toks
      .select(col("ts"),
        explode(graft.operators.Sketches.permStructs(depth)).as("pp"),
        col("h"))
      .select(col("ts"), col("pp.i").as("i"),
        ((col("pp.pa") * col("h") + col("pp.pb"))
          % graft.OracleHash.P % width).as("cell"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("i"), col("cell"))
      .agg(count(lit(1)).as("ccnt"))
      .select(col("window.start").as("window_start"), col("i"),
        col("cell"), col("ccnt"))
  }

  /** Scores a document stream against a STATIC unigram model artifact
    * (the token→cnt table + corpus total that
    * [[graft.operators.TextAnalysis.unigramLogprob]] trains) — the
    * serve-side of the train-batch/score-stream pair, like
    * `incrementalCandidates` is for dedup. Identical arithmetic to
    * the batch scorer (6-dp logprobs, decimal-accumulated means), so
    * on the same input the stream emits byte-identical scores; tokens
    * outside the model vocabulary drop like the batch inner join.
    * Stream-static join + per-doc aggregation (update output mode —
    * each document is complete within its micro-batch).
    */
  def lmScore(docs: DataFrame, counts: DataFrame, nTotal: Long): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    toks.join(counts, Seq("token"))
      .withColumn("lp",
        round(log(col("cnt").cast("double") / lit(nTotal.toDouble)), 6))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(col("lp").cast("decimal(28,12)")).as("s"))
      .select(col("doc_id"), col("n_tok"),
        graft.operators.TextAnalysis
          .meanLogprob6(col("s"), col("n_tok")).as("mean_logprob"))
  }

  /** Scores a document stream against a STATIC bigram model artifact
    * (the (w1,w2)→cb and w1→cu tables + vocab size that
    * [[graft.operators.TextAnalysis.bigramLogprob]] trains) with the
    * same add-one smoothing: lp = ln((cb+1)/(cu+V)). Bigrams form
    * IN-ROW (adjacent pairs of the filtered token array via a
    * transform over indices — no window function, which streaming
    * forbids), so the operator is stateless: stream-static joins +
    * one per-doc aggregation in update mode. Unseen bigrams/heads
    * smooth through LEFT joins (cb=0, cu=0) instead of dropping —
    * exactly what add-one smoothing is for at serve time; on
    * model-covered input the scores are byte-identical to the batch
    * operator (spec-pinned).
    */
  def bigramScore(docs: DataFrame, biCounts: DataFrame, uniCounts: DataFrame,
      vocabV: Long): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
      x => length(x) > lit(0))
    val pairs = docs
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(
          element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("bi"))
      .select(col("doc_id"), col("bi.w1").as("w1"), col("bi.w2").as("w2"))
    pairs
      .join(biCounts, Seq("w1", "w2"), "left")
      .join(uniCounts, Seq("w1"), "left")
      .withColumn("lp", round(log(
        (coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("cu"), lit(0L)) + lit(vocabV)).cast("double")), 6))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast("decimal(28,12)")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.operators.TextAnalysis
          .meanLogprob6(col("s"), col("n_bigrams")).as("mean_logprob"))
  }

  /** Scores a document stream against a STATIC DSIR log-ratio
    * artifact (the bucket→lr table
    * [[graft.operators.Pipeline.importanceLogRatios]] trains) — the
    * ingestion-side of train-batch/score-stream for importance
    * sampling: new crawl records get target-resemblance weights as
    * they arrive, before any batch job sees them. Identical
    * arithmetic to [[graft.operators.Pipeline.importanceSample]]
    * (shared occurrence hashing, 6-dp log-ratios, DECIMAL(28,12)
    * accumulation), so on the same input the stream emits
    * byte-identical weights. Stream-static join + per-doc aggregation
    * (update mode — each document is complete within its
    * micro-batch); zero streaming state.
    */
  def dsirScore(docs: DataFrame, logRatios: DataFrame, dim: Int = 256)
      : DataFrame =
    graft.operators.Pipeline.importanceOccurrences(docs, dim)
      .join(logRatios, Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        (round(sum(col("lr").cast("decimal(28,12)")).cast("double"), 6)
          + lit(0.0)).as("weight"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class SessionState(
      start: Long, end: Long, nEvents: Long, sumValue: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  val GapMs: Long = 30 * 60 * 1000L

  /** The NATIVE session_window sessionization under a watermark —
    * literally [[graft.operators.Events.sessionWindowAgg]], the same
    * aggregation the batch oracle certifies, now running
    * incrementally: session windows merge in state and emit once the
    * watermark passes a session's close (end + gap).
    */
  def sessionizeNative(events: Dataset[Event]): org.apache.spark.sql.DataFrame =
    graft.operators.Events.sessionWindowAgg(
      events.toDF().withWatermark("ts", "1 hour"))

  /** Gap-based sessionization with explicit keyed state. Emits a
    * session when a gap > 30 min is observed within a key's batch or
    * when the event-time timeout fires (watermark passed the gap).
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          if (state.hasTimedOut) {
            val s = state.get
            out += Session(userId, new Timestamp(s.start), new Timestamp(s.end),
              s.nEvents, s.sumValue)
            state.remove()
          } else {
            var cur = state.getOption.orNull
            evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              if (cur == null) {
                cur = SessionState(t, t, 1L, e.value)
              } else if (t - cur.end > GapMs) {
                out += Session(userId, new Timestamp(cur.start),
                  new Timestamp(cur.end), cur.nEvents, cur.sumValue)
                cur = SessionState(t, t, 1L, e.value)
              } else {
                cur = SessionState(cur.start, math.max(cur.end, t),
                  cur.nEvents + 1L, cur.sumValue + e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.end + GapMs)
            }
          }
          out.iterator
      }
  }

  /** Streaming twin of [[graft.operators.Dedup.incrementalDedup]]'s
    * ingestion shape: incoming documents MinHash themselves on the
    * stream (the same JVM signature map runs unchanged under
    * readStream) and band-join a STATIC index — stream-static
    * equi-joins are stateless, so each micro-batch pays only its own
    * signatures and probes, never the index scan-side state. Emits
    * candidate (delta, index) pairs with exact signature agreement;
    * a pair surfaces once per agreeing band (in-stream global dedup
    * would need unbounded state — downstream resolution dedups, as in
    * production ingestion).
    *
    * `indexBands`: (index_id, band, band_hash); `indexSigs`:
    * (index_id, sig array) — the precomputed artifact the batch
    * operator also probes. The index side goes through the same
    * hot-bucket collapse as the batch ingestion paths
    * ([[graft.operators.Dedup.guardedIndexBands]], r17): a bucket
    * with > cap index members keeps only its min-id representative,
    * so one boilerplate cluster in the index cannot fan a matching
    * delta stream out quadratically. In production the collapse is
    * baked into the persisted artifact ONCE; here it is expressed
    * inline on the static side (per-batch re-aggregation of a static
    * frame — the artifact-build cost, not a streaming-state cost).
    */
  def incrementalCandidates(docs: Dataset[(Long, String)],
      indexBands: DataFrame, indexSigs: DataFrame,
      numPerms: Int = 128, bands: Int = 32, tau: Double = 0.6,
      bucketCap: Int = graft.operators.Dedup.HotBucketCap): DataFrame = {
    import docs.sparkSession.implicits._
    val deltaBands = docs.flatMap { case (id, text) =>
      graft.operators.Dedup.minhashBandsJvm(text, numPerms, bands) match {
        case Some((sig, bandHashes)) =>
          bandHashes.iterator.zipWithIndex.map { case (h, b) => (id, sig, b, h) }
        case None => Iterator.empty
      }
    }.toDF("delta_id", "delta_sig", "band", "band_hash")
    val guardedIndex = graft.operators.Dedup
      .guardedIndexBands(indexBands, bucketCap, idCol = "index_id")
    deltaBands
      .join(guardedIndex, Seq("band", "band_hash"))
      .join(indexSigs, Seq("index_id"))
      .withColumn("est_jaccard", graft.operators.Dedup
        .sigAgreement(col("delta_sig"), col("sig"), numPerms))
      .filter(col("est_jaccard") >= tau)
      .select(col("delta_id"), col("index_id"), col("est_jaccard"))
  }

  /** Streaming paragraph-hygiene filter — the ingestion-side twin of
    * `Dedup.paragraphDedup`: each incoming document drops the
    * segments whose md5 already sits in the corpus paragraph index
    * (the boilerplate/duplicate-passage screen a crawl feed runs
    * before anything else touches the text). ZERO state: the index
    * set rides the task closure like [[classifierRoute]]'s model (a
    * production index is a Bloom filter over paragraph hashes —
    * the `dedup_bloom` pattern — broadcast once per executor);
    * per-record cost is the segment split + one set probe per
    * segment. Spec pins equality with the batch operator's
    * arithmetic on index-covered input.
    */
  def paragraphFilter(docs: Dataset[(Long, String)],
      indexHashes: scala.collection.Set[String],
      segWords: Int = 10): DataFrame = {
    import docs.sparkSession.implicits._
    docs.map { case (id, text) =>
      val (nSegs, nDup, clean) =
        graft.operators.Dedup.paragraphFilterJvm(text, indexHashes, segWords)
      (id, nSegs, nDup, clean)
    }.toDF("doc_id", "n_segs", "n_dup", "clean_text")
  }

  /** Streaming CDC-chunk hygiene filter — the ingestion-side twin of
    * `Dedup.cdcDedup` (r18): each incoming document splits on
    * content-defined boundaries (`Dedup.cdcChunksJvm` — the
    * insertion-robust segmentation, so a re-crawl that inserted words
    * EARLIER in the page still collides on the unchanged tail) and
    * drops the chunks whose md5 already sits in the corpus chunk
    * index. ZERO streaming state: the index set rides the task
    * closure like [[paragraphFilter]]'s (a production index is a
    * Bloom filter over chunk hashes, broadcast once per executor);
    * per-record cost is the rolling-hash scan + one set probe per
    * chunk. Spec pins equality with `Dedup.cdcFilterJvm`.
    */
  def cdcFilter(docs: Dataset[(Long, String)],
      indexHashes: scala.collection.Set[String],
      k: Int = 8, div: Long = 64L): DataFrame = {
    import docs.sparkSession.implicits._
    docs.map { case (id, text) =>
      val (nChunks, nDup, clean) =
        graft.operators.Dedup.cdcFilterJvm(text, indexHashes, k, div)
      (id, nChunks, nDup, clean)
    }.toDF("doc_id", "n_chunks", "n_dup", "clean_text")
  }

  /** Per-epoch cross-source matrix maintenance — the `foreachBatch`
    * body that keeps `Dedup.sourceOverlapMatrix`'s standing artifact
    * current as newly-ingested documents resolve to clusters (r18).
    * `delta` is this epoch's (doc_id, source, cluster) assignments
    * (the output of candidate resolution over
    * [[incrementalCandidates]]); `standingCS` the persisted
    * per-(cluster, source) doc counts. Emits the UPDATED
    * per-(cluster, pair) contribution rows for every cluster this
    * epoch touched — the fold contract is replace-by-cluster:
    * overwrite the standing contribution rows of the touched
    * clusters with the emitted ones, and the full matrix remains
    * `groupBy(source_a, source_b).agg(count, sum(n_a + n_b))`, exactly
    * the batch operator's final aggregate (spec-pinned).
    *
    * 100 TB notes: the delta collapse is map-side combined over one
    * micro-batch; the standing side is touched only via a
    * cluster-keyed semi-join (AQE-broadcastable — an epoch touches
    * ≪ |clusters|); the pair join runs on per-(cluster, source) rows
    * with sources a small enum, never document rows.
    */
  def sourceMatrixDelta(delta: DataFrame, standingCS: DataFrame): DataFrame = {
    val deltaCS = delta.groupBy(col("cluster"), col("source"))
      .agg(count(lit(1)).cast("long").as("n"))
    val touched = deltaCS.select(col("cluster")).distinct()
    val merged = standingCS
      .join(touched, Seq("cluster"), "left_semi")
      .unionByName(deltaCS)
      .groupBy(col("cluster"), col("source")).agg(sum(col("n")).as("n"))
    val spanning = merged.join(
      merged.groupBy(col("cluster"))
        .agg(countDistinct(col("source")).as("__ns"))
        .filter(col("__ns") > 1).select(col("cluster")),
      Seq("cluster"), "left_semi")
    spanning.as("a").join(spanning.as("b"),
        col("a.cluster") === col("b.cluster") &&
        col("a.source") < col("b.source"))
      .select(col("a.cluster").as("cluster"),
        col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
  }

  /** Per-epoch hot-bucket PROBE telemetry on the ingestion path (r18
    * — the streaming side of `Dedup.guardTelemetry`): for one
    * micro-batch's delta band probes (the
    * [[incrementalCandidates]] input shape), how many landed in
    * guarded (hot) index buckets, how many in cold ones, and how
    * many missed the index entirely. The counts an operator trends
    * per epoch to SEE the guard absorbing a boilerplate re-crawl —
    * a spike in `n_hot_probes` with flat `n_hot_buckets_touched` is
    * one mega-cluster being re-ingested. One row per epoch; the
    * index bucket-size frame is the persisted artifact
    * (re-aggregated inline here, the [[incrementalCandidates]]
    * static-side convention).
    */
  def guardProbeStats(deltaBands: DataFrame, indexBands: DataFrame,
      bucketCap: Int = graft.operators.Dedup.HotBucketCap): DataFrame = {
    val bsz = indexBands.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("__m"))
    deltaBands.join(bsz, Seq("band", "band_hash"), "left")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("__m") > bucketCap, 1L).otherwise(0L))
          .as("n_hot_probes"),
        countDistinct(when(col("__m") > bucketCap,
          concat_ws(":", col("band"), col("band_hash"))))
          .as("n_hot_buckets_touched"),
        sum(when(col("__m").isNotNull && col("__m") <= bucketCap, 1L)
          .otherwise(0L)).as("n_cold_probes"),
        sum(when(col("__m").isNull, 1L).otherwise(0L))
          .as("n_novel_probes"))
  }

  final case class TypedEvent(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  /** Per-user CEP-negation state: latest view / click micros
    * (Long.MinValue = none yet).
    */
  final case class CepState(viewUs: Long, clickUs: Long)
  final case class CepVerdict(purchase_id: Long, user_id: Long, direct: Int)
  /** Per-user as-of state: the latest view seen so far (micros). */
  final case class LastView(view_id: Long, tsUs: Long, value: Double)
  final case class Attribution(
      purchase_id: Long, user_id: Long, purchase_ts: Timestamp,
      view_id: Option[Long], view_ts: Option[Timestamp],
      gap_us: Option[Long], view_value: Option[Double])

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Inverse of [[micros]] — keeps sub-millisecond precision so the
    * emitted view_ts matches the batch twin's exact timestamp and
    * stays consistent with gap_us.
    */
  private def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming twin of [[graft.operators.Events.asofJoin]] — as-of
    * (point-in-time) enrichment as O(1) keyed state instead of the
    * batch running-last window: state per user is ONE LastView record,
    * purchases emit immediately with the view that was current at
    * their event time. Within a batch events are processed in
    * event-time order with the same (ts, view-first, event_id)
    * tie-break as the batch window; across batches the state carries
    * the last view forward. Late views older than an already-emitted
    * purchase cannot retract it — the streaming-vs-batch tradeoff
    * shared by every append-mode enrichment.
    */
  /** Streaming twin of [[graft.operators.Events.cepNegation]] —
    * absence matching (view → purchase within 1 h with NO click
    * between) as O(1) keyed state: two running-latest micros per
    * user, a purchase classifies immediately against them. Absence
    * detection is the famously hard CEP case for streams because
    * "nothing happened" never arrives as an event; the negation here
    * needs no timers because the predicate only consults the PAST
    * (last click at or before last view), so it resolves at the
    * purchase itself. Within a batch events process in (ts,
    * event_id) order — the batch window's exact frame; across
    * batches the two maxima carry forward.
    */
  /** Streaming entity canonicalizer — fuzzy name LINKING at ingest:
    * each incoming mention resolves against the catalog's SymSpell
    * deletion-variant index (`Search.symspellIndex`, the serving
    * artifact of the offline `er_fuzzy_names` join) to the
    * lexicographically smallest catalog name within edit distance 1,
    * or passes through unlinked. ZERO state — the index rides the
    * task closure like the classifier gate (a real catalog index is
    * megabytes for millions of names: variants × 16-byte hashes);
    * per-record cost is |mention| variant probes + exact verification
    * on the handful of hits.
    */
  def canonicalizeNames(mentions: Dataset[(Long, String)],
      index: Map[String, Seq[String]]): DataFrame = {
    import mentions.sparkSession.implicits._
    mentions.map { case (id, m) =>
      val canon = graft.operators.Search.canonicalizeJvm(m, index)
      (id, m, canon.getOrElse(m), canon.isDefined)
    }.toDF("mention_id", "mention", "canonical", "linked")
  }

  /** Per-user Markov-model scoring state: the previous event's type
    * and micros (null type = no prior event / fresh session).
    */
  final case class MarkovState(lastType: String, tsUs: Long)
  final case class MarkovScore(event_id: Long, user_id: Long,
      src_type: String, dst_type: String, p: Double)

  /** Streaming Markov-chain journey scorer — model SERVING for
    * `Events.markovTransitions`' artifact: each in-session transition
    * (gap ≤ 30 min, the family's shared session cut) scores
    * immediately against the static P(next | current) table riding
    * the task closure (|types|² entries — broadcast-sized by
    * construction). Unseen transitions score 0.0, which IS the
    * anomaly signal. O(1) state per user (previous type + micros),
    * carried across micro-batches; a session gap emits nothing and
    * re-anchors the chain.
    */
  def markovScore(events: Dataset[TypedEvent],
      model: Map[(String, String), Double]): Dataset[MarkovScore] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MarkovState, MarkovScore](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[TypedEvent], state: GroupState[MarkovState]) =>
          val out = scala.collection.mutable.ArrayBuffer[MarkovScore]()
          var st = state.getOption.orNull
          evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            if (st != null && us - st.tsUs <= 1800000000L)
              out += MarkovScore(e.event_id, uid, st.lastType, e.event_type,
                model.getOrElse((st.lastType, e.event_type), 0.0))
            st = MarkovState(e.event_type, us)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  def cepNegation(events: Dataset[TypedEvent]): Dataset[CepVerdict] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CepState, CepVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[TypedEvent], state: GroupState[CepState]) =>
          val out = scala.collection.mutable.ArrayBuffer[CepVerdict]()
          var st = state.getOption.getOrElse(
            CepState(Long.MinValue, Long.MinValue))
          evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            e.event_type match {
              case "purchase" =>
                val direct = st.viewUs != Long.MinValue &&
                  us - st.viewUs <= 3600000000L &&
                  (st.clickUs == Long.MinValue || st.clickUs <= st.viewUs)
                out += CepVerdict(e.event_id, uid, if (direct) 1 else 0)
              case "view"  => if (us > st.viewUs) st = st.copy(viewUs = us)
              case "click" => if (us > st.clickUs) st = st.copy(clickUs = us)
              case _       => () // other types don't touch the state
            }
          }
          state.update(st)
          out.iterator
      }
  }

  def asofAttribution(events: Dataset[TypedEvent]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastView, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[TypedEvent], state: GroupState[LastView]) =>
          val out = scala.collection.mutable.ArrayBuffer[Attribution]()
          var lv = state.getOption.orNull
          evs.toSeq
            .sortBy(e => (micros(e.ts),
              if (e.event_type == "view") 0 else 1, e.event_id))
            .foreach { e =>
              e.event_type match {
                case "view" =>
                  val us = micros(e.ts)
                  // same determinism rule as the batch dedup: later ts
                  // wins; on a ts tie the larger event_id wins
                  if (lv == null || us > lv.tsUs ||
                      (us == lv.tsUs && e.event_id > lv.view_id))
                    lv = LastView(e.event_id, us, e.value)
                case "purchase" =>
                  val o = Option(lv)
                  out += Attribution(e.event_id, uid, e.ts,
                    o.map(_.view_id),
                    o.map(v => tsOfMicros(v.tsUs)),
                    o.map(v => micros(e.ts) - v.tsUs),
                    o.map(_.value))
                case _ => () // other event types don't touch the state
              }
            }
          if (lv != null) state.update(lv)
          out.iterator
      }
  }

  /** Streaming ANN SERVING: a query-vector stream scored against the
    * static IVF index — the production vector-search serving shape
    * (index materialized once, broadcast quantizer, per-query cell
    * probing) running under Structured Streaming. Per incoming query:
    * the one-row quantizer array joins in (broadcast, keyed on a
    * constant — stream-static), the cell ranking is computed IN-ROW
    * exactly like the batch `ivfCellRanking`, the top-`nprobe` cells
    * explode to probe rows, a stream-static equi-join on `cell` pulls
    * the in-cell candidates, and the per-query top-k reduces through
    * the mergeable [[graft.functions.TopKAggregate]] (bounded state
    * per query, no window sort). Output mode Update; identical
    * scoring/tie rules to the batch `annIvf`, which
    * StreamingJobsSpec pins stream == batch on.
    *
    * `queries` needs (q_id: long, qv: array<double>); `index` is
    * [[graft.operators.Similarity.ivfIndex]]'s (cell, vec_id, v,
    * nrm); `quantizer` is [[graft.operators.Similarity.ivfQuantizer]]'s
    * one-row array.
    */
  def annServe(queries: DataFrame, index: DataFrame, quantizer: DataFrame,
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    import graft.functions.VectorFunctions.{dot, norm}
    val topk = udaf(new graft.functions.TopKAggregate(k))
    val probed = queries
      .select(col("q_id"), col("qv").as("q_v"), norm(col("qv")).as("q_nrm"),
        lit(1).as("__one"))
      .join(broadcast(quantizer.withColumn("__one", lit(1))), Seq("__one"))
      .withColumn("pcs", array_sort(zip_with(
        transform(col("cs"), c =>
          dot(col("q_v"), col("q_v")) -
            lit(2.0) * dot(col("q_v"), c.getField("cvec")) +
            dot(c.getField("cvec"), c.getField("cvec"))),
        col("cs"),
        (d, c) => struct(d.as("d2"), c.getField("cell").as("cell")))))
      .select(col("q_id"), col("q_v"), col("q_nrm"),
        explode(slice(col("pcs"), 1, nprobe)).as("pc"))
      .select(col("pc").getField("cell").as("cell"), col("q_id"),
        col("q_v"), col("q_nrm"))
    probed.join(index, Seq("cell"))
      .withColumn("score", round(
        when(col("nrm") === 0.0 || col("q_nrm") === 0.0, 0.0)
          .otherwise(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm"))), 6))
      .groupBy(col("q_id"))
      .agg(topk(col("vec_id"), col("score")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "row")))
      .select(col("q_id"), (col("i") + 1).cast("long").as("rank"),
        col("row._1").as("vec_id"), col("row._2").as("score"))
  }

  /** Streaming twin of the SCC TRIM phase
    * ([[graft.graph.Algorithms.stronglyConnectedComponents]]'s round-0
    * peel): over an edge stream, maintain per-vertex in/out degree
    * state and flag vertices that are PROVABLY singleton SCCs as of
    * the seen prefix — a vertex with no in-edge or no out-edge lies
    * on no cycle. Update mode: a vertex's verdict can flip to
    * non-trim when a later edge supplies the missing direction
    * (monotone one-way — trim evidence only ever disappears), so
    * downstream consumes the LATEST row per id. The iterative deep
    * peel (removing trimmed vertices re-exposes their neighbors) and
    * the FW-BW coloring stay in the periodic batch job — the standard
    * streaming/batch split for graph maintenance: the stream keeps
    * the cheap monotone invariant hot, the batch pass settles the
    * rest.
    *
    * 100 TB shape: state is two longs per vertex (the same keyed agg
    * state any streaming degree counter pays); each micro-batch
    * shuffles only its own edges' endpoint increments, map-side
    * combined.
    */
  /** Streaming twin of label propagation's MAINTENANCE half
    * ([[graft.graph.Algorithms.labelPropagation]]'s argmax state, the
    * sccTrimDegrees pattern applied to communities): over an edge
    * stream, accumulate per-(vertex, neighbor-community) VOTE COUNTS
    * against a static community `assignment` artifact (the last batch
    * LPA run — broadcast, like every model-artifact stream join in
    * this file). The emitted rows are the argmax REGISTERS, not the
    * verdict: like [[hllRegisters]]/[[cmsRegisters]], the streaming
    * query maintains the mergeable state (counts add across batches
    * and streams) and the consumer takes the per-vertex argmax —
    * a vertex whose assigned community no longer wins its
    * neighborhood vote is what the next periodic batch LPA must
    * revisit. The full propagation (labels chase each other) stays in
    * the batch job — the standard streaming/batch split for graph
    * maintenance.
    *
    * 100 TB shape: state is one long per (vertex, adjacent-community)
    * pair — bounded by the neighborhood's community diversity, not
    * the edge count; each micro-batch shuffles only its own edges'
    * increments, map-side combined; the assignment artifact rides the
    * task closure via broadcast, so no stream-side join state exists.
    */
  def lpaVotes(edges: DataFrame, assignment: DataFrame): DataFrame = {
    val nbrLabel = broadcast(
      assignment.select(col("id").as("dst"), col("label")))
    edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .join(nbrLabel, "dst")
      .groupBy(col("src").as("id"), col("label"))
      .agg(count(lit(1)).as("votes"))
  }

  def sccTrimDegrees(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"),
        lit(1L).as("out_d"), lit(0L).as("in_d"))
      .unionByName(edges.select(col("dst").as("id"),
        lit(0L).as("out_d"), lit(1L).as("in_d")))
      .groupBy(col("id"))
      .agg(sum(col("out_d")).as("out_deg"), sum(col("in_d")).as("in_deg"))
      .withColumn("trim", col("out_deg") === 0L || col("in_deg") === 0L)

  /** Streaming twin of the reference's WRITE half: the
    * Neo4jOutputFormat is itself a streaming-shaped batcher
    * (accumulate, flush at batchSize, flush at close —
    * Neo4jOutputFormat.java:104-116, 216-237), and this is that
    * batcher under Structured Streaming's recovery contract. Each
    * micro-batch runs through [[graft.neo4j.Neo4jWriter]] — parallel
    * per-partition accumulation, bounded POST batches, final flush —
    * against the transactional endpoint.
    *
    * Delivery is AT-LEAST-ONCE: after a crash between a foreachBatch
    * flush and the checkpoint commit, the whole micro-batch replays.
    * The statement must therefore be a keyed `MERGE … SET` (replay
    * converges instead of duplicating — the [[graft.neo4j.CypherPayload.mergeBatches]]
    * payload shape) and `cfg.idempotentWrites` must be set, which also
    * re-enables retries on ambiguous transport failures inside a
    * batch. Both are validated before the stream starts; so is the
    * `UNWIND $param` parameter-name extraction, which otherwise would
    * fail on the first micro-batch inside the stream thread.
    */
  def mergeBatches(rows: DataFrame, cfg: graft.neo4j.Neo4jConfig,
      parameterKeys: Seq[String], checkpointDir: String,
      batchSize: Int = 1000): org.apache.spark.sql.streaming.StreamingQuery = {
    require(cfg.idempotentWrites,
      "streaming writes replay micro-batches on recovery (at-least-once); " +
        "use a keyed MERGE statement and set Neo4jConfig.idempotentWrites")
    require("""(?is).*\bMERGE\b.*""".r.matches(cfg.query),
      "streaming write statements must MERGE on a key: a replayed CREATE " +
        "batch duplicates nodes")
    graft.neo4j.CypherPayload.parameterName(cfg.query): Unit
    val writeOne: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => graft.neo4j.Neo4jWriter.write(
        batch.toDF(), cfg, parameterKeys, batchSize)
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(writeOne)
      .start()
  }
}
