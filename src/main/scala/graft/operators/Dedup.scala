package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (SURVEY §2.3 #19-22):
  * exact, word-n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale discipline (the 100 TB story):
  *  - nothing here ever self-joins raw text: candidate generation
  *    always goes through an inverted index (shared shingle / LSH band
  *    / simhash block) so the shuffle carries hashes, not documents;
  *  - signatures are fixed-size (MinHash: 128×8 B; SimHash: 8 B) —
  *    orders of magnitude smaller than the documents they stand for;
  *  - hot shingles are capped (stop-shingle guard) so one degenerate
  *    key cannot produce a quadratic bucket.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id as
    * the canonical representative. One shuffle on a 128-bit hash —
    * uniformly distributed, no skew, no text in the shuffle.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("keep_doc_id"))

  /** Bloom-prefiltered incremental dedup - the 100 TB ingestion
    * accelerator for [[incrementalDedup]], with BYTE-IDENTICAL
    * output (it shares that query's oracle). A Bloom filter over the
    * index corpus's LSH band keys is built distributed (one aggregate
    * inside `DataFrameStatFunctions.bloomFilter`; ~1.2 MiB per
    * million keys at 1% fpp, broadcastable even at 10^9 docs x 32
    * bands), and each incoming delta band row does a memory-local
    * membership test BEFORE the band join: the overwhelming majority
    * of delta bands collide with nothing and never reach an exchange.
    * A Bloom filter has no false negatives, so every true index/delta
    * band collision survives pruning, and the band join itself
    * removes the ~fpp false positives - the filter is a pure cost
    * layer, never a semantics layer.
    *
    * The membership test is a `Dataset.filter` JVM lambda: Spark's
    * public sketch API (`util.sketch.BloomFilter`) has no
    * Column-level `might_contain` surface, and the per-row work is
    * two xxHash probes - far below the shuffle it eliminates.
    */
  def bloomIncremental(spark: SparkSession, sfDir: String, tau: Double = 0.6,
      numPerms: Int = 128, bands: Int = 32, fpp: Double = 0.01,
      bucketCap: Int = HotBucketCap): DataFrame = {
    val sigs = minhashSignatures(spark, sfDir, numPerms, bands).cache()
    val isDelta = col("doc_id") % 10 === 0
    // one 64-bit key per (band, hash): the band index rides the top
    // bits (bitwise combine - no overflow under ANSI arithmetic)
    val bandKey = col("band_hash").bitwiseXOR(shiftleft(col("band"), 58))
    val banded = sigs.select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band", "band_hash")))
      .withColumn("k", bandKey)
    val indexBanded = banded.filter(!isDelta)
    val nKeys = math.max(indexBanded.count(), 1L)
    val bloom = indexBanded.stat.bloomFilter("k", nKeys, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val deltaPruned = banded.filter(isDelta)
      .filter((r: org.apache.spark.sql.Row) =>
        bc.value.mightContainLong(r.getAs[Long]("k")))
    // the Bloom filter is built over the UNCOLLAPSED index keys, so
    // it prunes exactly the same delta rows as [[incrementalDedup]]
    // never joins; the collapsed index (r17) then keeps the join
    // itself linear in hot buckets — output stays byte-identical to
    // the plain incremental (shared oracle, spec-pinned)
    val cands = guardedIndexBands(indexBanded, bucketCap).as("x")
      .join(deltaPruned.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_hash") === col("y.band_hash"))
      .select(col("x.doc_id").as("index_id"), col("y.doc_id").as("delta_id"))
      .distinct()
    bestIndexMatch(sigs, cands, tau, numPerms)
  }

  /** Exact-substring duplicate candidates (the Lee et al. 2021
    * "Deduplicating Training Data" failure mode that document-level
    * hashing misses: long verbatim passages inside otherwise-distinct
    * documents). Candidate generator = winnowing
    * ([[TextAnalysis.winnowSelectedGrams]]): any shared exact
    * substring of ≥ k+w-1 code points forces a shared SELECTED k-gram,
    * so pairs sharing ≥ `minShared` selected grams are passage-dup
    * candidates. Inverted-index join on the gram string; grams seen in
    * > `dfCap` docs are dropped (boilerplate cannot decide a pair and
    * is a quadratic bucket).
    * 100 TB notes: selected grams are a ~2/(w+1) sample of each doc
    * (sliding winnowing's expected density), so the exchange carries
    * ~len/8 short strings per doc, never the text; the hot-gram cap
    * bounds every join bucket; pair counting is one keyed shuffle.
    */
  def substringDup(spark: SparkSession, sfDir: String, minShared: Int = 3,
      dfCap: Int = 20): DataFrame = {
    import spark.implicits._
    val sel = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        TextAnalysis.winnowSelectedGrams(t).map(g => (id, g)) }
      .toDF("doc_id", "g")
    val hot = sel.groupBy(col("g")).count().filter(col("count") > dfCap)
    val pruned = sel.join(broadcast(hot.select(col("g"))), Seq("g"), "left_anti")
    pruned.as("a").join(pruned.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Lower-cased word array of a document, the shared tokenization for
    * all near-dup operators (also mirrored in the DuckDB oracle).
    */
  private def words(c: Column): Column =
    split(lower(trim(c)), "\\s+")

  /** Word 3-gram shingles of `text` as an array of strings. */
  def shingles(c: Column, n: Int = 3): Column = {
    val w = words(c)
    // slide an n-window over the word array: transform over indices
    filter_(
      transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
        i => when(size(w) >= n,
          concat_ws(" ", slice(w, i + 1, lit(n))))),
      x => x.isNotNull)
  }

  private def filter_(c: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.filter(c, f)

  /** MinHash signature agreement estimate — the Jaccard estimator
    * every banding verify pass shares (batch full dedup, batch
    * incremental, streaming incremental). One definition so the
    * estimate (and anything oracle-certified about it) cannot drift
    * between the twins.
    */
  def sigAgreement(a: Column, b: Column, numPerms: Int): Column =
    round(size(filter_(zip_with(a, b, (x, y) => x === y), identity(_)))
      .cast("double") / numPerms, 6)

  /** Distinct word-n-gram shingle hashes of a document, computed in a
    * tight JVM loop (FNV-1a 64 over the words with space separators).
    *
    * Why not [[shingles]] + SQL hashing: nested higher-order functions
    * (transform/slice/concat_ws) are interpreted per element, not
    * codegen'd — profiled at ~2 ms/doc, which dominated both dedup
    * operators. The hash only needs to be internally consistent (the
    * oracle computes Jaccard from shingle *sets*, which are
    * hash-agnostic), so a JVM-side hash is free to replace the SQL
    * expression tree. ~µs/doc.
    */
  def shingleHashesJvm(text: String, n: Int = 3): Array[Long] = {
    val w = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    if (w.length < n) return Array.empty
    val out = new Array[Long](w.length - n + 1)
    var i = 0
    while (i <= w.length - n) {
      var h = 0xcbf29ce484222325L
      var k = i
      while (k < i + n) {
        val s = w(k)
        var j = 0
        while (j < s.length) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
        if (k < i + n - 1) { h ^= ' '; h *= 0x100000001b3L }
        k += 1
      }
      out(i) = h
      i += 1
    }
    out.distinct
  }

  /** (doc_id, shh: array<long>, n_sh) — the shared input of the
    * near-dup operators. Documents are independent, so the Dataset map
    * parallelizes per partition and shuffles nothing.
    */
  def docShingleHashes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // deliberately NOT widened before the shingling map: spreading
    // would shuffle raw text, and "text never rides an exchange" is
    // the family's pinned 100 TB discipline (PlanSpec) — the hashing
    // runs at the scan's width, which is wide at any real scale
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, shingleHashesJvm(t)) }
      .toDF("doc_id", "shh")
      .select(col("doc_id"), col("shh"), size(col("shh")).as("n_sh"))
  }

  /** Near-dup pairs by exact word-3-gram Jaccard ≥ τ.
    *
    * Inverted-index plan: explode distinct shingles → hash → self-join
    * on shingle hash to count the intersection |A∩B| per candidate
    * pair → Jaccard = |A∩B| / (|A|+|B|-|A∩B|). Only pairs sharing at
    * least one shingle are ever materialized, and the join key is an
    * 8-byte hash. Hot shingles (df > stopShingleCap) are dropped on
    * both sides — they only connect near-everything and cannot decide
    * a high-τ pair on their own.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String, tau: Double = 0.6,
      stopShingleCap: Int = 200): DataFrame =
    ngramPairIntersections(spark, sfDir, stopShingleCap, tau)
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("a_n") + col("b_n") - col("inter")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  /** Asymmetric near-dup detection by shingle CONTAINMENT
    * (Broder's measure): inter / min(|A|, |B|) — catches a short
    * document embedded in a much longer one, where Jaccard is diluted
    * by the size gap and never fires (|A∩B|/|A∪B| ≤ |A|/|B|). The
    * classic miss: a quoted article inside a discussion page.
    * Shares [[ngramPairIntersections]]'s exact candidate machinery
    * verbatim, so the two measures certify each other's plumbing.
    */
  def ngramContainment(spark: SparkSession, sfDir: String,
      tau: Double = 0.9, stopShingleCap: Int = 200): DataFrame =
    ngramPairIntersections(spark, sfDir, stopShingleCap, tau)
      .withColumn("containment", round(col("inter").cast("double") /
        least(col("a_n"), col("b_n")), 6))
      .filter(col("containment") >= tau)
      .select(col("a_id"), col("b_id"), col("containment"))
      .orderBy(col("a_id"), col("b_id"))

  /** Exact per-candidate-pair shingle intersections — the shared core
    * of [[ngramJaccard]] and [[ngramContainment]]: returns
    * (a_id, b_id, inter, a_n, b_n) for every pair that can clear the
    * caller's τ. Completeness argument: a qualifying pair has
    * intersection ≥ τ·min(|A|,|B|), so the smaller side S has fewer
    * than ⌊(1−τ)|S|⌋+1 shingles OUTSIDE the partner — hence among ANY
    * ⌊(1−τ)|S|⌋+1 distinct shingles of S ("probe set"), at least one
    * lies in the partner. Choosing the probe set as S's rare shingles
    * first (a shared rare shingle is already a rare-join candidate)
    * plus its globally-least-frequent hot shingles, every qualifying
    * pair is found either by the rare self-join or by the hot-probe
    * join. See inline notes for the skew bounds.
    */
  private def ngramPairIntersections(spark: SparkSession, sfDir: String,
      stopShingleCap: Int, tau: Double): DataFrame = {
    // per-doc distinct shingle hash arrays (~50×8 B per doc — the only
    // thing that ever shuffles; text stays at the scan)
    val docs = docShingleHashes(spark, sfDir).persist()

    val inv = docs.select(col("doc_id"), explode(col("shh")).as("h"))
    // candidate generation from RARE shingles only: a shingle shared by
    // > cap docs is a skew bomb (cap² pairs); rare sharing covers every
    // qualifying pair whose smaller side has ≥ ⌊(1−τ)n⌋+1 rare shingles
    // (pigeonhole above)
    val hot = inv.groupBy(col("h")).count()
      .filter(col("count") > stopShingleCap)
    val prunedRare = inv.join(broadcast(hot.select(col("h"))), Seq("h"), "left_anti")

    // exact intersection split by rarity class: rare and hot shingles
    // partition the shingle space, so |A∩B| = |A∩B|_rare + |A∩B|_hot.
    // The rare part falls out of the candidate self-join as a COUNT
    // (one groupBy — replaces a distinct + two joins shipping full
    // signature arrays); the hot part intersects per-doc HOT-ONLY
    // arrays, which are bounded by the stop-shingle list, not the
    // document length.
    val rarePairs = prunedRare.select(col("h"), col("doc_id").as("a_id"))
      .join(prunedRare.select(col("h"), col("doc_id").as("b_id")), Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("rare_inter"))

    // hot-probe fallback for near-orphan docs (< ⌊(1−τ)n⌋+1 rare
    // shingles, i.e. ≳τ of the doc is boilerplate): top up the probe
    // set with the doc's globally-least-frequent hot shingles and pair
    // against every index doc sharing one. Volume is bounded by
    // (#near-orphan docs) × (probe top-up) × df(chosen hot shingle) —
    // near-orphans are the boilerplate tail, and the least-frequent
    // hot shingles sit just above the cap, not at corpus df. This is
    // what makes the candidate set COMPLETE for τ-containment when a
    // mostly-boilerplate doc is embedded in a page (the intersection
    // is all-hot and the rare join never sees it).
    val probeSize = (col("n_sh") * lit(1.0 - tau)).cast("long") + lit(1L)
    val nRare = prunedRare.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rare"))
    val needHot = docs.select(col("doc_id"), col("n_sh"))
      .join(nRare, Seq("doc_id"), "left_outer")
      .withColumn("need_hot", probeSize - coalesce(col("n_rare"), lit(0L)))
      .filter(col("need_hot") > 0)
      .select(col("doc_id"), col("need_hot"))
    val rarestW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("count"), col("h"))
    val hotProbes = inv.join(broadcast(hot), Seq("h"))
      .join(needHot, Seq("doc_id"))
      .withColumn("rnk", row_number().over(rarestW))
      .filter(col("rnk") <= col("need_hot"))
      .select(col("doc_id"), col("h"))
    // pairs reached only through a hot probe share no rare shingle
    // (else the rare join already has them) → rare_inter = 0
    val hotProbePairs = hotProbes.select(col("h"), col("doc_id").as("p_id"))
      .join(inv.select(col("h"), col("doc_id").as("q_id")), Seq("h"))
      .filter(col("p_id") =!= col("q_id"))
      .select(least(col("p_id"), col("q_id")).as("a_id"),
        greatest(col("p_id"), col("q_id")).as("b_id"))
      .distinct()
      .join(rarePairs.select(col("a_id"), col("b_id")),
        Seq("a_id", "b_id"), "left_anti")
      .select(col("a_id"), col("b_id"), lit(0L).as("rare_inter"))
    val cands = rarePairs.unionByName(hotProbePairs)

    val hotSets = inv.join(broadcast(hot.select(col("h"))), Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_list(col("h")).as("hot_shh"))
    val meta = docs.select(col("doc_id"), col("n_sh"))
      .join(hotSets, Seq("doc_id"), "left_outer")

    cands
      .join(meta.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"),
        col("hot_shh").as("a_hot")), "a_id")
      .join(meta.select(col("doc_id").as("b_id"), col("n_sh").as("b_n"),
        col("hot_shh").as("b_hot")), "b_id")
      .withColumn("inter", col("rare_inter") +
        when(col("a_hot").isNull || col("b_hot").isNull, lit(0))
          .otherwise(size(array_intersect(col("a_hot"), col("b_hot")))))
      .select(col("a_id"), col("b_id"), col("inter"), col("a_n"), col("b_n"))
  }

  /** Duplicate clusters: exact-duplicate pairs ∪ word-3-gram Jaccard
    * near-dup pairs form an undirected graph; connected components
    * assign every document a cluster id (the min doc_id of its
    * cluster — singletons cluster with themselves). This is the
    * standard corpus-dedup reduction: keep one representative per
    * cluster, drop the rest.
    *
    * 100 TB shape: the pair edges are the ONLY cross-document data
    * (|pairs| ≪ |docs| on real corpora) and the component loop runs
    * on (id, label) longs — document text never enters the iteration.
    */
  def dedupClusters(spark: SparkSession, sfDir: String, tau: Double = 0.6)
      : DataFrame =
    clusterArtifact(spark, sfDir, tau).orderBy(col("doc_id"))

  /** Memoized cluster-assignment ARTIFACT per (session, dir, τ): the
    * observability family ([[dedupClusters]], [[clusterStats]],
    * `Pipeline.curate`) all read the same partition of the corpus. In
    * a production pipeline the clustering runs once and its output is
    * persisted (the `dedup_incremental` index-artifact pattern); here
    * the artifact is an eagerly-materialized localCheckpoint holding
    * only (doc_id, cluster) int64 pairs — corpus-linear but 16 B/doc
    * — so the pair-graph + component loop is paid once per session,
    * not once per consuming query.
    */
  def clusterArtifact(spark: SparkSession, sfDir: String,
      tau: Double = 0.6): DataFrame = {
    clusterCache.getOrCompute((spark, sfDir, tau), spark) {
      computeClusters(spark, sfDir, tau).localCheckpoint(true)
    }
  }

  private val clusterCache =
    new graft.Artifacts.Cache[(SparkSession, String, Double), DataFrame]()

  private def computeClusters(spark: SparkSession, sfDir: String,
      tau: Double): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val hashed = docs.select(col("doc_id"), md5(col("text")).as("h"))
    // exact-dup edges as STARS to the per-hash min doc (m−1 rows per
    // hash group, r16) — identical connectivity to the old all-pairs
    // self-join (same md5 ⇒ same component, transitively), but a
    // 10⁵-copy boilerplate group contributes 10⁵−1 edges, not ~5×10⁹
    val exactPairs = hashed
      .join(hashed.groupBy(col("h"))
        .agg(min(col("doc_id")).as("src"), count(lit(1)).as("__m"))
        .filter(col("__m") > 1), Seq("h"))
      .filter(col("doc_id") =!= col("src"))
      .select(col("src"), col("doc_id").as("dst"))
    val nearPairs = ngramJaccard(spark, sfDir, tau)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    // the component loop only ever sees docs that appear in a pair —
    // |pairs| ≪ |docs| on real corpora, so the iterative part runs on
    // the duplicate graph, not the corpus; everything else defaults to
    // its own id via one left join
    val edges = exactPairs.unionByName(nearPairs)
    // pair graphs are ≪ corpus by construction: take the union-find
    // fast path under 1M edges, distributed propagation above
    val clustered = graft.graph.Algorithms
      .connectedComponents(edges, localEdgeCap = 1 << 20)
      .select(col("id").as("doc_id"), col("comp"))
    docs.select(col("doc_id"))
      .join(clustered, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster"))
  }

  /** Cluster-size histogram over [[dedupClusters]]'s partition — the
    * dedup observability report: how much document mass sits in
    * clusters of size 1 (unique), 2, 3, … (near-dup families). A fat
    * tail here means boilerplate floods; the singleton share is the
    * corpus's effective uniqueness rate.
    *
    * 100 TB notes: two map-side-combined aggregations over the
    * already-computed cluster ARTIFACT (cluster → size, size →
    * count); nothing document-sized moves and the clustering itself
    * is not recomputed.
    */
  def clusterStats(spark: SparkSession, sfDir: String, tau: Double = 0.6)
      : DataFrame =
    clusterArtifact(spark, sfDir, tau)
      .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        (count(lit(1)) * col("sz")).as("n_docs"))
      .orderBy(col("cluster_size"))

  /** MinHash signature + LSH band hashes of one document, computed in
    * a tight JVM loop over the [[graft.OracleHash]] family. One pass
    * over the word 3-gram shingles; per shingle, numPerms `(a·h+b) mod
    * P` permutation hashes feed running minima. Returns None for docs
    * with fewer than 3 words (no shingles → no signature), mirroring
    * the `len(ws) >= 3` filter in the DuckDB oracle.
    */
  def minhashBandsJvm(text: String, numPerms: Int = 128, bands: Int = 32)
      : Option[(Array[Long], Array[Long])] = {
    import graft.OracleHash.{P, a, b, poly, polyChar}
    val w = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    if (w.length < 3) return None
    val aArr = Array.tabulate(numPerms)(a)
    val bArr = Array.tabulate(numPerms)(b)
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i + 2 < w.length) {
      var h = poly(w(i), 0L)
      h = polyChar(h, ' ')
      h = poly(w(i + 1), h)
      h = polyChar(h, ' ')
      h = poly(w(i + 2), h)
      var p = 0
      while (p < numPerms) {
        val hp = (aArr(p) * h + bArr(p)) % P
        if (hp < sig(p)) sig(p) = hp
        p += 1
      }
      i += 1
    }
    val r = numPerms / bands
    val bh = Array.tabulate(bands) { bnd =>
      var x = 0L
      var j = bnd * r
      while (j < (bnd + 1) * r) { x = (x * 1000003L + sig(j)) % P; j += 1 }
      x
    }
    Some((sig, bh))
  }

  /** Signature extraction as a pure transformation over (doc_id,
    * text) — shuffle-free and STATELESS, so the identical code path
    * runs under `readStream` (StreamingJobsSpec pins that property).
    */
  def minhashSignaturesOf(docs: DataFrame,
      numPerms: Int = 128, bands: Int = 32): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        minhashBandsJvm(t, numPerms, bands).map { case (s, bh) => (id, s, bh) }
      }
      .toDF("doc_id", "sig", "bands")
  }

  /** (doc_id, sig, bands) — JVM-computed MinHash signatures. No
    * shuffle: documents are independent, the map runs per partition.
    * (The previous formulation — explode shingles + 128 SQL min
    * aggregates — paid an explode shuffle and 128 aggregate buffers
    * per row; this is ~20× faster at sf0.1 and bit-identical to the
    * DuckDB oracle.)
    */
  def minhashSignatures(spark: SparkSession, sfDir: String,
      numPerms: Int = 128, bands: Int = 32): DataFrame =
    minhashSignaturesOf(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      numPerms, bands)

  /** Default hot-bucket cap for the LSH-family band/block joins: a
    * bucket holding more members than this emits STAR edges (every
    * member → bucket-min doc, m−1 rows) instead of all pairs
    * (m(m−1)/2). 64 keeps all-pairs exactness for every sanely-sized
    * bucket (≤ 2,016 pairs) while bounding the duplicate-cluster
    * blowup: 10⁵ boilerplate copies in one bucket emit 10⁵−1 edges,
    * not ~5×10⁹.
    */
  val HotBucketCap = 64

  /** Candidate pairs from an exploded bucket table — the shared
    * HOT-BUCKET-GUARDED core of [[minhashLsh]] and
    * [[lshTuningCurve]] (r16, the [[ngramPairIntersections]]
    * stop-shingle discipline applied to the band join): buckets of
    * size ≤ `bucketCap` emit the exact all-pairs candidate set;
    * larger buckets — duplicate clusters, mirrored boilerplate —
    * emit star edges to the bucket's min doc_id, keeping candidate
    * volume LINEAR in bucket size. Every bucket member appears in
    * ≥ 1 candidate row.
    *
    * RECALL CONTRACT (r17, stated honestly): within a still-hot
    * bucket, only pairs INVOLVING the bucket-min representative are
    * ever handed to the caller's verify pass — a qualifying pair of
    * two NON-representative members is surfaced only if it also
    * collides in some cold bucket (with 32 independent bands, near
    * dups usually do). Pair-returning callers therefore have bounded
    * recall inside hot buckets; CLUSTER-building callers are exact
    * whenever the hot bucket is a true duplicate family (every
    * member verifies against the representative, so a
    * connected-components closure — [[dedupClusters]]'s stage —
    * recovers the full cluster transitively). This is the same
    * recall-for-boundedness trade every production LSH dedup makes;
    * callers that need exact all-pairs inside mega-buckets pass
    * `bucketCap = Int.MaxValue` and accept the quadratic join.
    *
    * 100 TB shape: the hot-bucket list is tiny by construction (only
    * buckets with > cap members) → broadcast; the all-pairs join runs
    * only on capped buckets, so no single key can go quadratic.
    */
  private def bandedCandidatePairs(banded: DataFrame,
      keys: Seq[String], bucketCap: Int): DataFrame = {
    val kc = keys.map(col)
    val hot = banded.groupBy(kc: _*)
      .agg(count(lit(1)).as("__m"), min(col("doc_id")).as("__min_id"))
      .filter(col("__m") > bucketCap)
    val tagged = banded.join(broadcast(hot), keys, "left")
    val cold = tagged.filter(col("__m").isNull)
      .select(kc :+ col("doc_id"): _*)
    val coldPairs = cold.as("x").join(cold.as("y"),
        keys.map(k => col(s"x.$k") === col(s"y.$k"))
          .reduce(_ && _) && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    val hotPairs = tagged
      .filter(col("__m").isNotNull && col("doc_id") =!= col("__min_id"))
      .select(col("__min_id").as("a_id"), col("doc_id").as("b_id"))
    coldPairs.unionByName(hotPairs).distinct()
  }

  /** MinHash+LSH near-dup: b bands × r rows banding over the MinHash
    * signature; docs colliding in any band become candidates (via the
    * hot-bucket-guarded [[bandedCandidatePairs]]); a verification
    * pass computes the estimated Jaccard from full signatures and
    * keeps pairs ≥ τ.
    *
    * At 100 TB: the banding join shuffles (band_id, band_hash, doc_id)
    * — 24 B rows; text is never shuffled. Verification joins the 1 KB
    * signatures for candidate pairs only, and the hot-bucket star
    * edges keep duplicate clusters from going quadratic — at the
    * recall bound documented on [[bandedCandidatePairs]]: inside a
    * still-hot bucket only representative-involving pairs are
    * verified, so two non-representative members of a mega-bucket
    * appear as a pair only via a cold band collision (their cluster
    * is still recoverable transitively through the representative).
    */
  def minhashLsh(spark: SparkSession, sfDir: String, tau: Double = 0.6,
      numPerms: Int = 128, bands: Int = 32,
      bucketCap: Int = HotBucketCap): DataFrame = {
    val sigs = minhashSignatures(spark, sfDir, numPerms, bands).cache()
    val banded = sigs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "band_hash")))
    val cands = bandedCandidatePairs(banded, Seq("band", "band_hash"), bucketCap)

    cands
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("est_jaccard",
        sigAgreement(col("a_sig"), col("b_sig"), numPerms))
      .filter(col("est_jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("est_jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The LSH TUNING CURVE — the probabilistic guarantee behind
    * [[minhashLsh]], made inspectable: for the configured (bands b,
    * rows-per-band r), the collision probability
    * `P(candidate | jaccard = j) = 1 − (1 − j^r)^b` on a Jaccard
    * grid, alongside the corpus's MEASURED candidate and verified
    * pair counts. This is the dial that justifies a (b, r) choice
    * before committing a 100 TB pass: the curve's S-step must sit
    * below the verification threshold τ, and the measured candidate
    * volume shows what the banding actually admits.
    *
    * 100 TB notes: the curve is pure per-row math over a 9-row grid;
    * the two measured counts reuse the existing banding plan's
    * exchanges and collapse to one broadcast row each.
    */
  def lshTuningCurve(spark: SparkSession, sfDir: String, tau: Double = 0.6,
      numPerms: Int = 128, bands: Int = 32,
      bucketCap: Int = HotBucketCap): DataFrame = {
    val r = numPerms / bands
    val sigs = minhashSignatures(spark, sfDir, numPerms, bands).cache()
    val banded = sigs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "band_hash")))
    val cands = bandedCandidatePairs(banded, Seq("band", "band_hash"), bucketCap)
    val nCand = cands.agg(count(lit(1)).as("measured_candidates"))
    val nPairs = cands
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("est_jaccard",
        sigAgreement(col("a_sig"), col("b_sig"), numPerms))
      .filter(col("est_jaccard") >= tau)
      .agg(count(lit(1)).as("measured_pairs"))
    spark.range(1, 10)
      .select((col("id").cast("double") / 10).as("j"))
      .withColumn("p_candidate",
        round(lit(1.0) - pow(lit(1.0) - pow(col("j"), r), bands), 6)
          + lit(0.0))
      .crossJoin(broadcast(nCand))
      .crossJoin(broadcast(nPairs))
      .orderBy(col("j"))
  }

  /** Hot-bucket collapse of a STATIC index band artifact — the
    * ingestion-side form of the star discipline (r17, finishing
    * r16's [[bandedCandidatePairs]]): buckets with ≤ `bucketCap`
    * index members pass through untouched; hotter buckets keep ONLY
    * the bucket-min representative row, so any delta row colliding
    * there is matched against the representative instead of fanning
    * out to every member. The routine re-crawl disaster this bounds:
    * 10⁵ index copies × 10³ delta copies of one boilerplate page in
    * one bucket emitted 10⁸ candidate rows × 32 bands before
    * `distinct()`; collapsed, the bucket contributes |delta| rows per
    * band. Shared by [[incrementalDedup]], [[bloomIncremental]] and
    * the streaming twin
    * ([[graft.streaming.StreamingJobs.incrementalCandidates]]) — in
    * production this collapse is baked into the persisted index
    * artifact once, not recomputed per batch.
    *
    * OUTPUT CONTRACT: the downstream best-match verify is
    * BYTE-IDENTICAL to the unguarded join whenever hot buckets are
    * true duplicate families (members share the signature, so every
    * candidate ties on est_jaccard and the rank's `index_id`
    * tie-break already picks the bucket-min representative — the
    * spec pins this). For a hash-collision bucket of genuinely
    * distinct docs the recall bound of [[bandedCandidatePairs]]
    * applies: a delta row is tested against that bucket's
    * representative only, plus whatever its other bands hit.
    */
  def guardedIndexBands(banded: DataFrame,
      bucketCap: Int = HotBucketCap, idCol: String = "doc_id"): DataFrame = {
    val hot = banded.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("__m"), min(col(idCol)).as("__min_id"))
      .filter(col("__m") > bucketCap)
    banded.join(broadcast(hot), Seq("band", "band_hash"), "left")
      .filter(col("__m").isNull || col(idCol) === col("__min_id"))
      .select(col(idCol), col("band"), col("band_hash"))
  }

  /** Hot-bucket guard TELEMETRY (r18): per-cap counts of guarded
    * buckets and collapsed index rows over a banded frame — the
    * observability a 100-TB operator wants before trusting the
    * guard: how many buckets would the cap touch, how many rows does
    * the collapse remove, and how hot is the hottest bucket. One
    * row per cap; all aggregates are map-side-combined over the
    * (band, band_hash) size frame, never the banded rows themselves.
    */
  def guardStatsFromBanded(banded: DataFrame, caps: Seq[Int]): DataFrame = {
    val bsz = banded.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("__m"))
    caps.map { cap =>
      bsz.agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("__m") > cap, 1L).otherwise(0L)).as("n_hot_buckets"),
        sum(when(col("__m") > cap, col("__m") - 1L).otherwise(0L))
          .as("n_collapsed_rows"),
        max(col("__m")).as("max_bucket"))
        .select(lit(cap.toLong).as("cap"), col("n_buckets"),
          col("n_hot_buckets"), col("n_collapsed_rows"), col("max_bucket"))
    }.reduce(_.unionByName(_))
  }

  /** The telemetry curve over the corpus' MinHash banding — what the
    * [[guardedIndexBands]] collapse WOULD do at caps 1..the
    * production [[HotBucketCap]]. `n_collapsed_rows` at cap c = index
    * rows the guard removes (bucket members beyond the kept
    * representative); the curve flattening toward the production cap
    * is the evidence that real corpora only trip the guard on
    * genuine mega-clusters.
    */
  def guardTelemetry(spark: SparkSession, sfDir: String,
      numPerms: Int = 128, bands: Int = 32): DataFrame = {
    val sigs = minhashSignatures(spark, sfDir, numPerms, bands)
    val banded = sigs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "band_hash")))
    guardStatsFromBanded(banded, Seq(1, 2, 4, 8, HotBucketCap))
      .orderBy(col("cap"))
  }

  /** Incremental near-dup screen: match a NEW batch against the
    * EXISTING corpus without re-pairing the corpus with itself — the
    * shape of production ingestion, where the index side's band
    * hashes are a precomputed artifact and each delta only pays
    * |delta| signatures plus an asymmetric band join. Here the split
    * is deterministic (doc_id % 10 == 0 is the incoming batch); the
    * band join keeps only (index, delta) pairs, so index-index
    * candidates — the quadratic bulk of a full dedup — never form,
    * and the index side is hot-bucket-collapsed
    * ([[guardedIndexBands]], r17) so a duplicate cluster present on
    * BOTH sides cannot go quadratic either.
    * Output: delta docs with their nearest index duplicate.
    */
  def incrementalDedup(spark: SparkSession, sfDir: String, tau: Double = 0.6,
      numPerms: Int = 128, bands: Int = 32,
      bucketCap: Int = HotBucketCap): DataFrame = {
    val sigs = minhashSignatures(spark, sfDir, numPerms, bands).cache()
    val isDelta = col("doc_id") % 10 === 0
    val banded = sigs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "band_hash")))
    val cands = guardedIndexBands(banded.filter(!isDelta), bucketCap).as("x")
      .join(banded.filter(isDelta).as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_hash") === col("y.band_hash"))
      .select(col("x.doc_id").as("index_id"), col("y.doc_id").as("delta_id"))
      .distinct()
    bestIndexMatch(sigs, cands, tau, numPerms)
  }

  /** Shared verify tail of the incremental dedups ([[incrementalDedup]]
    * and [[bloomIncremental]]): estimate Jaccard from the full
    * signatures for each candidate pair, threshold at `tau`, and keep
    * one verdict per incoming doc — its best index match.
    */
  private def bestIndexMatch(sigs: DataFrame, cands: DataFrame,
      tau: Double, numPerms: Int): DataFrame =
    cands
      .join(sigs.select(col("doc_id").as("index_id"), col("sig").as("a_sig")),
        "index_id")
      .join(sigs.select(col("doc_id").as("delta_id"), col("sig").as("b_sig")),
        "delta_id")
      .withColumn("est_jaccard",
        sigAgreement(col("a_sig"), col("b_sig"), numPerms))
      .filter(col("est_jaccard") >= tau)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("delta_id"))
          .orderBy(col("est_jaccard").desc, col("index_id"))))
      .filter(col("rnk") === 1)
      .select(col("delta_id"), col("index_id"), col("est_jaccard"))
      .orderBy(col("delta_id"))

  /** SimHash bit width: 60 rather than 64 so every bit constant
    * (1L << b) and block mask stays positive in engines without
    * unsigned 64-bit ints (the DuckDB oracle computes the identical
    * hash), and splits evenly into 4 × 15-bit pigeonhole blocks.
    */
  val SimhashBits = 60

  /** 60-bit SimHash of one document from word-unigram hashes: per bit
    * position, sum ±1 over tokens (parity of the per-bit permutation
    * hash decides the sign) and take the sign of the sum. Returns None
    * when the document has no non-empty tokens.
    */
  def simhashJvm(text: String): Option[Long] = {
    import graft.OracleHash.{P, a, b, poly}
    val w = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val aArr = Array.tabulate(SimhashBits)(a)
    val bArr = Array.tabulate(SimhashBits)(b)
    val sums = new Array[Int](SimhashBits)
    var any = false
    var i = 0
    while (i < w.length) {
      val t = w(i)
      if (t.nonEmpty) {
        any = true
        val h = poly(t, 0L)
        var bit = 0
        while (bit < SimhashBits) {
          if (((aArr(bit) * h + bArr(bit)) % P & 1L) == 1L) sums(bit) += 1
          else sums(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    if (!any) None
    else {
      var sh = 0L
      var bit = 0
      while (bit < SimhashBits) { if (sums(bit) > 0) sh |= 1L << bit; bit += 1 }
      Some(sh)
    }
  }

  /** (doc_id, simhash) — JVM-computed, shuffle-free (was: explode
    * tokens + 64 conditional-sum SQL aggregates, the second-hottest
    * bench query at sf0.1).
    */
  def simhashSignatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) => simhashJvm(t).map((id, _)) }
      .toDF("doc_id", "simhash")
  }

  /** SimHash near-dup pairs with Hamming distance ≤ k (default 3) via
    * the pigeonhole principle: split the 60-bit hash into k+1 blocks
    * (15-bit blocks for the default k=3); any pair within distance k
    * must agree exactly on ≥1 block → join per block, then verify true
    * Hamming distance. Join keys are (block_idx, block_value) — no
    * all-pairs comparison. The block count DERIVES from k: a fixed
    * split would silently lose completeness the moment a caller asked
    * for a larger distance.
    *
    * Hot buckets (> `bucketCap` members — low-entropy block values,
    * boilerplate) re-pigeonhole EXACTLY on the remaining bits (r16);
    * only buckets still hot after the sub-split fall back to
    * star edges (see the inline note).
    */
  def simhashNearDup(spark: SparkSession, sfDir: String, maxHamming: Int = 3,
      bucketCap: Int = HotBucketCap): DataFrame = {
    require(maxHamming >= 0 && maxHamming < SimhashBits, s"bad maxHamming $maxHamming")
    val nBlocks = maxHamming + 1
    val width = (SimhashBits + nBlocks - 1) / nBlocks
    val sigs = simhashSignatures(spark, sfDir).cache()
    val blocks = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until nBlocks).map(i =>
        shiftright(col("simhash"), i * width)
          .bitwiseAND(lit((1L << width) - 1))): _*))
        .as(Seq("blk", "blk_val")))
    // Hot-bucket guard, EXACT form (r16): simhash buckets go hot from
    // LOW-ENTROPY block values (boilerplate zero-blocks), whose
    // members are mostly NOT near-dups — star edges there would lose
    // real pairs (spec-caught at maxHamming 6). Instead hot buckets
    // re-pigeonhole on the REMAINING bits: a qualifying pair in the
    // bucket already agrees on this block, so its ≤ k differing bits
    // all live in the other `SimhashBits − width`, and a (k+1)-way
    // sub-split of those catches it on some sub-block — completeness
    // preserved, bucket sizes shrunk by the remaining bits' entropy.
    // Only a bucket still hot AFTER sub-splitting (width + subW bits
    // of agreement by > cap docs — the near-identical family, where
    // the true pair OUTPUT is itself quadratic) falls back to star
    // edges to the bucket-min doc. RECALL BOUND there (r17, honest):
    // the Hamming verify below keeps only star pairs within
    // maxHamming of the REPRESENTATIVE, so a qualifying pair of two
    // non-representative members whose only agreeing block leads to
    // a still-hot sub-bucket is returned only if another block puts
    // it in a cold(er) bucket; its CLUSTER stays recoverable via the
    // representative's edges when the family is a true duplicate
    // cluster. Exact all-pairs inside mega-buckets: pass
    // `bucketCap = Int.MaxValue`.
    val sz1 = blocks.groupBy(col("blk"), col("blk_val"))
      .agg(count(lit(1)).as("__m")).filter(col("__m") > bucketCap)
    // NO empty-hot plan probe: it was built, measured (spots
    // 2.21→2.61 s, full bench 1.75→2.07 s — the probe job costs more
    // than the three empty branches it skips), and reverted on
    // evidence — the r15 DELETE-probe discipline. The lazy plan pays
    // ~1.2 s over the pre-guard single join at sf0.1, the price of
    // the recall-exact sub-split.
    val tagged = blocks.join(broadcast(sz1), Seq("blk", "blk_val"), "left")
    val cold = tagged.filter(col("__m").isNull)
      .select(col("blk"), col("blk_val"), col("doc_id"))
    val coldPairs = cold.as("x").join(cold.as("y"),
        col("x.blk") === col("y.blk") &&
        col("x.blk_val") === col("y.blk_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    val remW = SimhashBits - width
    val subW = (remW + nBlocks - 1) / nBlocks
    // remaining bits with this block's width-bit slice removed:
    // high bits shift down into the gap, low bits stay. Shift amounts
    // ≥ SimhashBits are guarded to their closed forms (high part 0,
    // low part the whole hash): for nBlocks ≥ 8 the top block's
    // (blk+1)*width reaches 64, where Java/Spark shifts mask the
    // amount mod 64 (shiftright(x, 64) = x) while DuckDB saturates to
    // 0 — the guard keeps the expression exact and engine-agnostic
    // for every maxHamming instead of only the defaults (r17,
    // ADVICE).
    val remExpr = expr(
      s"shiftleft(CASE WHEN (blk + 1) * $width >= $SimhashBits " +
        s"THEN cast(0 as bigint) " +
        s"ELSE shiftright(simhash, cast((blk + 1) * $width as int)) END, " +
        s"cast(blk * $width as int)) | " +
        s"(CASE WHEN blk * $width >= $SimhashBits THEN simhash " +
        s"ELSE simhash & (shiftleft(cast(1 as bigint), " +
        s"cast(blk * $width as int)) - 1) END)")
    val hotSub = tagged.filter(col("__m").isNotNull)
      .withColumn("__rem", remExpr)
      .select(col("doc_id"), col("blk"), col("blk_val"),
        posexplode(array((0 until nBlocks).map(j =>
          shiftright(col("__rem"), j * subW)
            .bitwiseAND(lit((1L << subW) - 1))): _*))
          .as(Seq("sub", "sub_val")))
    val sz2 = hotSub.groupBy(col("blk"), col("blk_val"),
        col("sub"), col("sub_val"))
      .agg(count(lit(1)).as("__m2"), min(col("doc_id")).as("__min_id"))
      .filter(col("__m2") > bucketCap)
    val tagged2 = hotSub.join(broadcast(sz2),
      Seq("blk", "blk_val", "sub", "sub_val"), "left")
    val cold2 = tagged2.filter(col("__m2").isNull)
      .select(col("blk"), col("blk_val"), col("sub"), col("sub_val"),
        col("doc_id"))
    val cold2Pairs = cold2.as("x").join(cold2.as("y"),
        col("x.blk") === col("y.blk") &&
        col("x.blk_val") === col("y.blk_val") &&
        col("x.sub") === col("y.sub") &&
        col("x.sub_val") === col("y.sub_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    val starPairs = tagged2
      .filter(col("__m2").isNotNull && col("doc_id") =!= col("__min_id"))
      .select(col("__min_id").as("a_id"), col("doc_id").as("b_id"))
    val pairs = coldPairs.unionByName(cold2Pairs).unionByName(starPairs)
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("a_id"), col("simhash").as("a_sh")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("simhash").as("b_sh")), "b_id")
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** URL-canonicalization dedup — the cheapest and first dedup gate of
    * a crawled corpus (CommonCrawl-derived pipelines drop same-URL
    * refetches before any content hashing): canonicalize each
    * document's source URL, group, keep the smallest doc_id.
    *
    * Canonical form: lowercase → strip scheme (`https?://`) → strip a
    * leading `www.` → drop tracking query params
    * (`utm_*`/`gclid`/`fbclid`/`ref`, the left-to-right global regex
    * removes chains like `?utm_a=..&utm_b=..` entirely) → strip one
    * trailing slash. No capture groups, so the Java and RE2/DuckDB
    * regex dialects agree literally. A kept param AFTER a dropped one
    * (`?utm_x=1&page=2` → dangling `&page=2`) is out of scope here and
    * documented: the synthetic corpus carries no URL column, so (like
    * [[TextAnalysis.domains]]) each doc gets a deterministic
    * generated URL whose spelling variants (scheme, WWW-casing,
    * trailing slash, tracking suffixes) the canonicalizer must
    * collapse.
    *
    * 100 TB notes: canonicalization is codegen'd regexp at the scan;
    * the single exchange carries (canon_url) keys with map-side
    * partial aggregation — the same shape as exact dedup, minus the
    * text bytes.
    */
  def urlDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("doc_id")
    val url = concat(
      when(id % 2 === 0, lit("https://")).otherwise(lit("http://")),
      when(id % 3 === 0, lit("WWW.")).otherwise(lit("")),
      lit("Site"), (id % 40).cast("string"), lit(".Example.COM/Articles/"),
      (id % 120).cast("string"),
      when(id % 4 === 0, lit("/")).otherwise(lit("")),
      when(id % 5 === 0, lit("?utm_source=feed&utm_medium=rss"))
        .otherwise(when(id % 7 === 0, lit("?utm_campaign=x&gclid=abc123"))
          .otherwise(lit(""))))
    Tables.documents(spark, sfDir)
      .select(id, url.as("url"))
      .withColumn("canon_url",
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          lower(col("url")),
          "^https?://", ""), "^www\\.", ""),
          "[?&](utm_[a-z]+|gclid|fbclid|ref)=[^&#]*", ""), "/$", ""))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_variants"),
        min(col("doc_id")).as("keep_id"))
      .orderBy(col("canon_url"))
  }

  /** Per-SOURCE duplication rates over the cluster artifact — the
    * provenance-level dedup observability a crawl pipeline triages
    * with: a source whose documents are mostly non-canonical cluster
    * members is re-crawling content the corpus already holds (cut its
    * fetch budget), while a low dup-rate source is contributing new
    * material. Canonical = the cluster's smallest doc_id, the same
    * convention every cluster consumer shares.
    *
    * 100 TB notes: reads the memoized [[clusterArtifact]] (16 B/doc),
    * one doc_id-keyed join against the (doc_id, source) projection,
    * then a map-side-combined collapse to |sources| rows.
    */
  def sourceRates(spark: SparkSession, sfDir: String,
      tau: Double = 0.6): DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
      .join(clusterArtifact(spark, sfDir, tau), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") === col("cluster"), 1L).otherwise(0L))
          .as("n_canonical"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_canonical").cast("double") / col("n_docs"), 6)
          + lit(0.0))
      .orderBy(col("source"))

  /** Cross-SOURCE near-duplication MATRIX over the cluster artifact
    * (r17) — the pairwise provenance view [[sourceRates]] aggregates
    * away: for each unordered source pair, how many duplicate
    * clusters span both and how much document mass those shared
    * clusters hold across the two sides. The triage this answers:
    * which source PAIRS are re-crawling each other's content (cut
    * one side's fetch budget), versus sources whose duplication is
    * internal (boilerplate within the source).
    *
    * 100 TB notes: reads the memoized 16 B/doc [[clusterArtifact]];
    * the per-(cluster, source) collapse is map-side combined, only
    * clusters spanning ≥ 2 sources survive the semi-join (duplicate
    * clusters are ≪ corpus and spanning ones rarer still), and the
    * pair join runs on (cluster, source) rows — bounded by
    * |spanning clusters| × |sources per cluster|², with sources a
    * small enum; document rows never enter the pairing.
    */
  def sourceOverlapMatrix(spark: SparkSession, sfDir: String,
      tau: Double = 0.6): DataFrame = {
    val cs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .join(clusterArtifact(spark, sfDir, tau), Seq("doc_id"))
      .groupBy(col("cluster"), col("source"))
      .agg(count(lit(1)).as("n"))
    sourceMatrixFromCS(cs).orderBy(col("source_a"), col("source_b"))
  }

  /** The pair-matrix aggregate over a per-(cluster, source) count
    * frame — shared by [[sourceOverlapMatrix]] and the streaming
    * per-epoch maintenance
    * ([[graft.streaming.StreamingJobs.sourceMatrixDelta]]'s fold
    * referee), so batch/stream equivalence is one code path.
    */
  def sourceMatrixFromCS(cs: DataFrame): DataFrame = {
    val spanning = cs.join(
      cs.groupBy(col("cluster"))
        .agg(countDistinct(col("source")).as("__ns"))
        .filter(col("__ns") > 1).select(col("cluster")),
      Seq("cluster"), "left_semi")
    spanning.as("a").join(spanning.as("b"),
        col("a.cluster") === col("b.cluster") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_clusters"),
        sum(col("a.n") + col("b.n")).as("n_docs_involved"))
  }

  /** JVM twin of [[paragraphDedup]]'s segmentation: the same
    * fixed-window split (Spark's `split(text, ' ')` keeps interior
    * and trailing empty tokens, so this uses `split(" ", -1)`), the
    * same ≥1-segment floor. Used by the streaming filter, which
    * drops segments whose md5 is already in a corpus index.
    */
  private[graft] def segmentsJvm(text: String,
      segWords: Int = 10): Array[String] = {
    val ws = text.split(" ", -1)
    val nseg = math.max((ws.length + segWords - 1) / segWords, 1)
    Array.tabulate(nseg) { i =>
      ws.slice(i * segWords,
        math.min(ws.length, (i + 1) * segWords)).mkString(" ")
    }
  }

  private[graft] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** One-document paragraph hygiene against a known-paragraph index:
    * (n_segs, n_dup, cleaned text). The per-record arithmetic of the
    * streaming twin ([[graft.streaming.StreamingJobs.paragraphFilter]]),
    * identical to what [[paragraphDedup]] computes for a doc whose
    * duplicate segments all collide with the index.
    */
  private[graft] def paragraphFilterJvm(text: String,
      index: scala.collection.Set[String],
      segWords: Int = 10): (Long, Long, String) = {
    val segs = segmentsJvm(text, segWords)
    val kept = segs.filterNot(s => index.contains(md5Hex(s)))
    (segs.length.toLong, (segs.length - kept.length).toLong,
      kept.mkString(" "))
  }

  /** One-document CDC hygiene against a known-chunk index:
    * (n_chunks, n_dup, cleaned text) — [[paragraphFilterJvm]]'s
    * arithmetic over [[cdcChunksJvm]]'s insertion-robust segmentation.
    * Chunks are raw slices, so the cleaned text rejoins with no
    * separator. The per-record body of the streaming twin
    * ([[graft.streaming.StreamingJobs.cdcFilter]]).
    */
  private[graft] def cdcFilterJvm(text: String,
      index: scala.collection.Set[String],
      k: Int = 8, div: Long = 64L): (Long, Long, String) = {
    val chunks = cdcChunksJvm(text, k, div)
    val kept = chunks.filterNot(c => index.contains(md5Hex(c)))
    (chunks.length.toLong, (chunks.length - kept.length).toLong,
      kept.mkString(""))
  }

  /** Content-defined chunk split of one document — the rsync/LBFS
    * discipline (r17): a chunk boundary falls after code-point
    * position j+k-1 whenever the rolling poly-1000003 mod 2^40 hash
    * of the k-gram ending there ([[TextAnalysis.winnowHashes]]' exact
    * family, so the DuckDB oracle replays it bit-for-bit) is ≡ 0 mod
    * `div`. Boundaries derive from LOCAL content, so an insertion
    * perturbs only the chunk it lands in and boundaries re-synchronize
    * right after — the property fixed-window segmentation
    * ([[paragraphDedup]]) lacks, where one inserted word shifts every
    * later segment. Expected chunk length ≈ div code points.
    * Documents shorter than k (or boundary-free) are one whole-text
    * chunk. Concatenating the chunks with no separator reconstructs
    * the text exactly. Production CDC adds min/max chunk bounds (a
    * stateful per-doc scan, still JVM-local); the unbounded form here
    * keeps the oracle a pure per-position filter.
    */
  private[graft] def cdcChunksJvm(text: String, k: Int = 8,
      div: Long = 64L): Array[String] = {
    val s = text.codePoints().toArray
    if (s.length < k) return Array(text)
    val hashes = TextAnalysis.winnowHashes(s, k)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var j = 0
    while (j < hashes.length) {
      val cut = j + k // code points [start, cut) form a chunk
      if (hashes(j) % div == 0L && cut < s.length && cut > start) {
        out += new String(s, start, cut - start)
        start = cut
      }
      j += 1
    }
    out += new String(s, start, s.length - start)
    out.toArray
  }

  /** Content-defined-chunk exact dedup (r17) — [[paragraphDedup]]'s
    * first-occurrence-wins pass over [[cdcChunksJvm]]'s
    * insertion-robust segmentation: duplicated passages are detected
    * even when a re-crawl inserted or deleted words EARLIER in the
    * page, because chunk boundaries re-derive from local content
    * instead of fixed offsets (the spec pins exactly this: an early
    * insertion leaves the fixed-window pass blind while the CDC pass
    * still drops the shared tail). Output matches the paragraph
    * pass's shape: per-doc chunk counts and the md5 of the cleaned
    * (first-occurrence-only) text, rejoined with no separator since
    * chunks are raw slices.
    *
    * 100 TB notes: chunking is a per-partition JVM map (documents are
    * independent); only (md5, doc_id, idx) rows reach the dedup
    * exchange; drop decisions collapse to doc-keyed index lists; the
    * rebuild is an in-row filter over the doc's own chunk array.
    */
  def cdcDedup(spark: SparkSession, sfDir: String, k: Int = 8,
      div: Long = 64L): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, cdcChunksJvm(t, k, div)) }
      .toDF("doc_id", "chunks")
    val segHashes = base
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("seg_idx", "seg")))
      .select(col("doc_id"), col("seg_idx").cast("long").as("seg_idx"),
        md5(col("seg")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"), col("seg_idx"))
    val drops = segHashes.withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("seg_idx"))).as("drop_idx"))
    base.join(drops, Seq("doc_id"), "left")
      .withColumn("drop_idx",
        coalesce(col("drop_idx"), expr("CAST(array() AS ARRAY<BIGINT>)")))
      .select(col("doc_id"), size(col("chunks")).cast("long").as("n_chunks"),
        size(col("drop_idx")).cast("long").as("n_dup"),
        md5(expr("array_join(filter(chunks, (s, i) -> " +
          "NOT array_contains(drop_idx, CAST(i AS BIGINT))), '')"))
          .as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** Paragraph-level exact dedup (Lee et al. 2021 / Dolma's
    * exact-paragraph pass): duplicated PASSAGES are removed from
    * otherwise-kept documents — the corpus-cleaning step document-level
    * dedup cannot do (a boilerplate header shared by a million pages
    * leaves every page "unique" at the doc level). First occurrence
    * wins, globally ordered by (doc_id, position); each document
    * reports its segment counts and the md5 of its cleaned text.
    *
    * The synthetic corpus has no newline paragraph boundaries, so the
    * segmenter is a fixed `segWords`-word window; on real data the
    * segmenter is `split(text, '\n\n')` — one expression swap, the
    * plan is identical.
    *
    * 100 TB notes: only (md5(seg), doc_id, seg_idx) rows reach the
    * dedup exchange — 16-byte hashes, never paragraph text. The drop
    * decisions collapse to doc-cardinality index lists that join back
    * doc-keyed (AQE-broadcastable: most corpora drop from a small
    * fraction of docs), and the rebuild is an in-row higher-order
    * filter over the doc's own segment array at the scan — cleaned
    * text never shuffles either.
    */
  def paragraphDedup(spark: SparkSession, sfDir: String,
      segWords: Int = 10): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("nseg",
        greatest(expr(s"(size(ws) + ${segWords - 1}) div $segWords"),
          lit(1L)))
      .withColumn("segs", expr(
        s"transform(sequence(CAST(0 AS BIGINT), nseg - 1), " +
          s"i -> array_join(slice(ws, CAST(i * $segWords + 1 AS INT), " +
          s"$segWords), ' '))"))
    val segHashes = base
      .select(col("doc_id"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))
      .select(col("doc_id"), col("seg_idx").cast("long").as("seg_idx"),
        md5(col("seg")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"), col("seg_idx"))
    val drops = segHashes.withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("seg_idx"))).as("drop_idx"))
    base.join(drops, Seq("doc_id"), "left")
      .withColumn("drop_idx",
        coalesce(col("drop_idx"), expr("CAST(array() AS ARRAY<BIGINT>)")))
      .select(col("doc_id"), col("nseg").as("n_segs"),
        size(col("drop_idx")).cast("long").as("n_dup"),
        md5(expr("array_join(filter(segs, (s, i) -> " +
          "NOT array_contains(drop_idx, CAST(i AS BIGINT))), ' ')"))
          .as("clean_md5"))
      .orderBy(col("doc_id"))
  }
}
