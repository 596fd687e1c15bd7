package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Generated DuckDB oracle SQL for the operators whose reference
  * implementation is a JVM loop (MinHash, SimHash, winnowing) or an
  * iterative DataFrame program (PageRank). Each query here re-derives
  * the exact same integers/doubles as the Spark operator — see
  * [[OracleHash]] for the shared hash family and the overflow-freedom
  * argument — so the driver's hash compare is exact, not approximate.
  */
object OracleSql {
  import OracleHash.{P, polySql, permSql, permTableSql, permJoinedSql}

  /** Word-split shared with the ngram-jaccard oracle (proved
    * equivalent to Spark's `split(lower(trim(text)), "\\s+")`).
    */
  private val WordsCte =
    """w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      |  FROM documents)""".stripMargin

  /** MinHash + LSH banding, mirroring [[Dedup.minhashBandsJvm]]:
    * word-3-gram shingles → poly-31 base hash → 128 `(a·h+b) mod P`
    * minima → 32 band hashes → band-bucket candidate join → signature
    * agreement ≥ τ. Agreement count / 128 is exact in binary, so the
    * 6-dp round matches bit-for-bit.
    */
  def minhashLsh(numPerms: Int = 128, bands: Int = 32, tau: Double = 0.6): String =
    minhashCtes(numPerms, bands) + "," + candCte + s""",
       |eq AS (
       |  SELECT c.a_id, c.b_id,
       |    round(CAST(len(list_filter(range(1, ${numPerms + 1}),
       |      i -> a.sig[i] = b.sig[i])) AS DOUBLE)/$numPerms, 6) AS est_jaccard
       |  FROM cand c
       |  JOIN sigl a ON c.a_id = a.doc_id
       |  JOIN sigl b ON c.b_id = b.doc_id)
       |SELECT a_id, b_id, est_jaccard FROM eq
       |WHERE est_jaccard >= $tau ORDER BY a_id, b_id""".stripMargin

  /** The hot-bucket-guarded candidate CTE shared by [[minhashLsh]]
    * and [[lshTuningCurve]], mirroring
    * [[Dedup.bandedCandidatePairs]] with the same
    * [[Dedup.HotBucketCap]]: buckets of ≤ cap members all-pair;
    * larger buckets emit star edges to the bucket-min doc_id.
    */
  private def candCte: String = {
    val cap = Dedup.HotBucketCap
    s"""
       |bsz AS (
       |  SELECT band, band_hash, COUNT(*) AS m, MIN(doc_id) AS min_id
       |  FROM banded GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a_id, b_id FROM (
       |    SELECT x.doc_id AS a_id, y.doc_id AS b_id
       |    FROM banded x
       |    JOIN banded y
       |      ON x.band = y.band AND x.band_hash = y.band_hash
       |      AND x.doc_id < y.doc_id
       |    JOIN bsz s ON s.band = x.band AND s.band_hash = x.band_hash
       |    WHERE s.m <= $cap
       |    UNION ALL
       |    SELECT s.min_id AS a_id, b.doc_id AS b_id
       |    FROM banded b
       |    JOIN bsz s ON s.band = b.band AND s.band_hash = b.band_hash
       |    WHERE s.m > $cap AND b.doc_id <> s.min_id))""".stripMargin
  }

  /** The shared shingle→signature→band CTE chain (no final SELECT)
    * behind [[minhashLsh]] and [[incrementalDedup]] — one definition
    * so the two oracles cannot drift.
    */
  private def minhashCtes(numPerms: Int, bands: Int): String = {
    val r = numPerms / bands
    s"""WITH $WordsCte,
       |sh AS (
       |  SELECT doc_id, list_transform(range(1, greatest(len(ws)-2, 0)+1),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS gs
       |  FROM w WHERE len(ws) >= 3),
       |ex AS (SELECT doc_id, unnest(gs) AS g FROM sh),
       |hb AS (SELECT doc_id, ${polySql("g")} AS h0 FROM ex),
       |perm AS (
       |  SELECT doc_id, p, MIN(${permJoinedSql("h0")}) AS sp
       |  FROM hb CROSS JOIN ${permTableSql(numPerms)}
       |  GROUP BY doc_id, p),
       |sigl AS (SELECT doc_id, list(sp ORDER BY p) AS sig FROM perm GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, b AS band,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*$r+1 : b*$r+$r]),
       |      (acc, x) -> (acc*1000003+x)%$P) AS band_hash
       |  FROM sigl CROSS JOIN (SELECT unnest(range(0, $bands)) AS b) bb)""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.Dedup.guardTelemetry]]: the
    * shared banding CTEs, bucket sizes per (band, band_hash), then
    * one row per cap with guarded-bucket / collapsed-row counts.
    */
  def guardTelemetry(numPerms: Int = 128, bands: Int = 32): String =
    minhashCtes(numPerms, bands) + s""",
       |bsz AS (
       |  SELECT band, band_hash, COUNT(*) AS m FROM banded GROUP BY 1, 2),
       |caps AS (
       |  SELECT unnest([1, 2, 4, 8, ${Dedup.HotBucketCap}]) AS cap)
       |SELECT CAST(c.cap AS BIGINT) AS cap,
       |  COUNT(*) AS n_buckets,
       |  CAST(SUM(CASE WHEN m > c.cap THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hot_buckets,
       |  CAST(SUM(CASE WHEN m > c.cap THEN m - 1 ELSE 0 END) AS BIGINT)
       |    AS n_collapsed_rows,
       |  MAX(m) AS max_bucket
       |FROM bsz, caps c GROUP BY 1 ORDER BY cap""".stripMargin

  /** DuckDB twin of [[graft.operators.TextAnalysis.novelty]]: the
    * shared word-3-gram shingle hashes, global first-occurrence
    * ownership by smallest doc_id, per-doc novel fraction.
    */
  def novelty(): String =
    s"""WITH $WordsCte,
       |sh AS (
       |  SELECT doc_id, list_transform(range(1, greatest(len(ws)-2, 0)+1),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS gs
       |  FROM w WHERE len(ws) >= 3),
       |ex AS (SELECT doc_id, unnest(gs) AS g FROM sh),
       |hb AS (SELECT DISTINCT doc_id, ${polySql("g")} AS h FROM ex),
       |own AS (SELECT h, MIN(doc_id) AS owner FROM hb GROUP BY 1)
       |SELECT b.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |  CAST(SUM(CASE WHEN o.owner = b.doc_id THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_novel,
       |  round(CAST(SUM(CASE WHEN o.owner = b.doc_id THEN 1 ELSE 0 END)
       |    AS DOUBLE) / COUNT(*), 6) + 0.0 AS novelty
       |FROM hb b JOIN own o ON b.h = o.h
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.lshTuningCurve]]: the
    * shared banding CTEs for the measured counts, the closed-form
    * collision curve on the same grid.
    */
  def lshTuningCurve(numPerms: Int = 128, bands: Int = 32,
      tau: Double = 0.6): String = {
    val r = numPerms / bands
    minhashCtes(numPerms, bands) + "," + candCte + s""",
       |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS measured_candidates FROM cand),
       |eq AS (
       |  SELECT round(CAST(len(list_filter(range(1, ${numPerms + 1}),
       |    i -> a.sig[i] = b.sig[i])) AS DOUBLE)/$numPerms, 6) AS est_jaccard
       |  FROM cand c
       |  JOIN sigl a ON c.a_id = a.doc_id
       |  JOIN sigl b ON c.b_id = b.doc_id),
       |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS measured_pairs
       |       FROM eq WHERE est_jaccard >= $tau),
       |g AS (SELECT CAST(i AS DOUBLE)/10 AS j
       |      FROM (SELECT unnest(range(1, 10)) AS i))
       |SELECT g.j,
       |  round(1.0 - pow(1.0 - pow(g.j, $r), $bands), 6) + 0.0 AS p_candidate,
       |  nc.measured_candidates, np.measured_pairs
       |FROM g CROSS JOIN nc CROSS JOIN np ORDER BY j""".stripMargin
  }

  /** Incremental near-dup, mirroring [[Dedup.incrementalDedup]]: the
    * minhashLsh CTEs with an ASYMMETRIC candidate join (index side =
    * doc_id % 10 <> 0, delta side = doc_id % 10 = 0), the index side
    * hot-bucket-collapsed to its min-id representative above
    * [[Dedup.HotBucketCap]] members (r17, mirroring
    * [[Dedup.guardedIndexBands]]), and a best-match rank per delta
    * doc.
    */
  def incrementalDedup(numPerms: Int = 128, bands: Int = 32,
      tau: Double = 0.6): String =
    minhashCtes(numPerms, bands) + s""",
       |isz AS (
       |  SELECT band, band_hash, COUNT(*) AS m, MIN(doc_id) AS min_id
       |  FROM banded WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
       |gidx AS (
       |  SELECT b.doc_id, b.band, b.band_hash
       |  FROM banded b
       |  JOIN isz s ON s.band = b.band AND s.band_hash = b.band_hash
       |  WHERE b.doc_id % 10 <> 0
       |    AND (s.m <= ${Dedup.HotBucketCap} OR b.doc_id = s.min_id)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS index_id, y.doc_id AS delta_id
       |  FROM gidx x JOIN banded y
       |    ON x.band = y.band AND x.band_hash = y.band_hash
       |    AND y.doc_id % 10 = 0),
       |eq AS (
       |  SELECT c.index_id, c.delta_id,
       |    round(CAST(len(list_filter(range(1, ${numPerms + 1}),
       |      i -> a.sig[i] = b.sig[i])) AS DOUBLE)/$numPerms, 6) AS est_jaccard
       |  FROM cand c
       |  JOIN sigl a ON c.index_id = a.doc_id
       |  JOIN sigl b ON c.delta_id = b.doc_id),
       |kept AS (SELECT * FROM eq WHERE est_jaccard >= $tau),
       |rk AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY delta_id ORDER BY est_jaccard DESC, index_id) AS rnk
       |  FROM kept)
       |SELECT delta_id, index_id, est_jaccard FROM rk WHERE rnk = 1
       |ORDER BY delta_id""".stripMargin

  /** SimHash near-dup, mirroring [[Dedup.simhashJvm]] +
    * [[Dedup.simhashNearDup]]: 60-bit simhash from token-hash parity
    * sums, 4 × 15-bit pigeonhole blocks, Hamming ≤ 3 verify.
    */
  def simhash(maxHamming: Int = 3): String = {
    val bits = Dedup.SimhashBits
    val nBlocks = maxHamming + 1
    val width = (bits + nBlocks - 1) / nBlocks
    val blkMask = (1L << width) - 1
    val remW = bits - width
    val subW = (remW + nBlocks - 1) / nBlocks
    val subMask = (1L << subW) - 1
    val cap = Dedup.HotBucketCap
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents),
       |t AS (SELECT doc_id, ${polySql("tok")} AS h0 FROM toks WHERE len(tok) > 0),
       |bs AS (
       |  SELECT doc_id, p AS b,
       |    SUM(CASE WHEN ${permJoinedSql("h0")} % 2 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM t CROSS JOIN ${permTableSql(bits)}
       |  GROUP BY doc_id, p),
       |sh AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
       |      AS simhash
       |  FROM bs GROUP BY doc_id),
       |bl AS (
       |  SELECT doc_id, i AS blk, (simhash >> CAST(i*$width AS INT)) & $blkMask AS blk_val
       |  FROM sh CROSS JOIN (SELECT unnest(range(0, $nBlocks)) AS i) ii),
       |blsz AS (SELECT blk, blk_val, COUNT(*) AS m FROM bl GROUP BY 1, 2),
       |coldp AS (
       |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM bl x
       |  JOIN bl y ON x.blk = y.blk AND x.blk_val = y.blk_val
       |    AND x.doc_id < y.doc_id
       |  JOIN blsz s ON s.blk = x.blk AND s.blk_val = x.blk_val
       |  WHERE s.m <= $cap),
       |hot AS (
       |  SELECT b.doc_id, b.blk, b.blk_val,
       |    ((CASE WHEN (b.blk+1)*$width >= $bits THEN CAST(0 AS BIGINT)
       |           ELSE h.simhash >> CAST((b.blk+1)*$width AS INT) END)
       |       << CAST(b.blk*$width AS INT)) |
       |      (CASE WHEN b.blk*$width >= $bits THEN h.simhash
       |            ELSE h.simhash & ((CAST(1 AS BIGINT) << CAST(b.blk*$width AS INT)) - 1) END) AS rem
       |  FROM bl b
       |  JOIN blsz s ON s.blk = b.blk AND s.blk_val = b.blk_val
       |  JOIN sh h ON h.doc_id = b.doc_id
       |  WHERE s.m > $cap),
       |sub AS (
       |  SELECT doc_id, blk, blk_val, j AS sub,
       |    (rem >> CAST(j*$subW AS INT)) & $subMask AS sub_val
       |  FROM hot CROSS JOIN (SELECT unnest(range(0, $nBlocks)) AS j) jj),
       |subsz AS (
       |  SELECT blk, blk_val, sub, sub_val, COUNT(*) AS m2,
       |    MIN(doc_id) AS min_id
       |  FROM sub GROUP BY 1, 2, 3, 4),
       |p AS (
       |  SELECT DISTINCT a_id, b_id FROM (
       |    SELECT * FROM coldp
       |    UNION ALL
       |    SELECT x.doc_id AS a_id, y.doc_id AS b_id
       |    FROM sub x
       |    JOIN sub y ON x.blk = y.blk AND x.blk_val = y.blk_val
       |      AND x.sub = y.sub AND x.sub_val = y.sub_val
       |      AND x.doc_id < y.doc_id
       |    JOIN subsz s ON s.blk = x.blk AND s.blk_val = x.blk_val
       |      AND s.sub = x.sub AND s.sub_val = x.sub_val
       |    WHERE s.m2 <= $cap
       |    UNION ALL
       |    SELECT s.min_id AS a_id, b.doc_id AS b_id
       |    FROM sub b
       |    JOIN subsz s ON s.blk = b.blk AND s.blk_val = b.blk_val
       |      AND s.sub = b.sub AND s.sub_val = b.sub_val
       |    WHERE s.m2 > $cap AND b.doc_id <> s.min_id))
       |SELECT p.a_id, p.b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM p JOIN sh a ON p.a_id = a.doc_id JOIN sh b ON p.b_id = b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** Winnowing fingerprint, mirroring
    * [[TextAnalysis.winnowFingerprint]]: poly-1000003 mod 2^40 char
    * 8-gram hashes, SLIDING 16-windows (step 1 — the Schleimer
    * scheme), xor-fold of the hashes at the distinct argmin
    * positions.
    */
  def fingerprint(k: Int = 8, w: Int = 16): String = {
    val M = 1L << 40
    s"""WITH h AS (
       |  SELECT doc_id,
       |    list_transform(range(1, greatest(len(text)-$k+1, 0)+1),
       |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
       |             list_transform(range(i, i+$k),
       |               j -> CAST(unicode(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
       |           (acc, c) -> (acc*1000003+c)%$M)) AS hs
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, CASE WHEN len(hs) = 0 THEN 0
       |    ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(
       |        list_distinct(flatten(
       |          list_transform(range(0, greatest(len(hs)-$w+1, 1)),
       |            b -> list_filter(range(b+1, least(b+$w, len(hs))+1),
       |              p -> hs[p] = list_min(hs[b+1 : least(b+$w, len(hs))]))))),
       |        p -> hs[p])),
       |      (x, y) -> xor(x, y)) END AS fingerprint
       |  FROM h)
       |SELECT doc_id, fingerprint FROM m ORDER BY doc_id""".stripMargin
  }

  /** Content-defined-chunk dedup, mirroring [[Dedup.cdcChunksJvm]] +
    * [[Dedup.cdcDedup]]: the same poly-1000003 mod 2^40 k-gram
    * rolling hashes as [[fingerprint]], boundaries where the hash is
    * ≡ 0 mod `div` (excluding a boundary at the very end), chunks =
    * slices between cuts, then the paragraph pass's
    * first-occurrence-wins window and no-separator rejoin.
    */
  def cdcDedup(k: Int = 8, div: Long = 64L): String = {
    val M = 1L << 40
    s"""WITH h AS (
       |  SELECT doc_id, text,
       |    list_transform(range(1, greatest(len(text)-$k+1, 0)+1),
       |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
       |             list_transform(range(i, i+$k),
       |               j -> CAST(unicode(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
       |           (acc, c) -> (acc*1000003+c)%$M)) AS hs
       |  FROM documents),
       |cts AS (
       |  SELECT doc_id, text,
       |    list_concat(list_concat([CAST(0 AS BIGINT)],
       |      list_filter(list_transform(range(1, len(hs)+1),
       |        j -> CASE WHEN hs[CAST(j AS INT)] % $div = 0
       |          THEN CAST(j + $k - 1 AS BIGINT) ELSE NULL END),
       |        p -> p IS NOT NULL AND p < len(text))),
       |      [CAST(len(text) AS BIGINT)]) AS cuts
       |  FROM h),
       |segs AS (
       |  SELECT doc_id, CAST(t.ci - 1 AS BIGINT) AS seg_idx,
       |    substr(text, CAST(cuts[CAST(t.ci AS INT)] + 1 AS INT),
       |      CAST(cuts[CAST(t.ci AS INT) + 1] - cuts[CAST(t.ci AS INT)] AS INT))
       |      AS seg
       |  FROM cts, UNNEST(range(1, len(cuts))) AS t(ci)),
       |rn AS (
       |  SELECT doc_id, seg_idx, seg, row_number() OVER (
       |    PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn
       |  FROM segs)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  md5(COALESCE(string_agg(seg, '' ORDER BY seg_idx)
       |    FILTER (WHERE rn = 1), '')) AS clean_md5
       |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Exact-substring dup candidates, mirroring [[Dedup.substringDup]]:
    * same per-gram rolling hashes as [[fingerprint]], but instead of
    * xor-folding the window minima it extracts the SELECTED gram
    * substrings (every argmin position per window), then counts
    * gram-sharing pairs under the same hot-gram cap.
    */
  def substringDup(k: Int = 8, w: Int = 16, minShared: Int = 3,
      dfCap: Int = 20): String = {
    val M = 1L << 40
    s"""WITH h AS (
       |  SELECT doc_id, text,
       |    list_transform(range(1, greatest(len(text)-$k+1, 0)+1),
       |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
       |             list_transform(range(i, i+$k),
       |               j -> CAST(unicode(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
       |           (acc, c) -> (acc*1000003+c)%$M)) AS hs
       |  FROM documents),
       |sel AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    list_transform(
       |      list_distinct(flatten(
       |        list_transform(range(0, greatest(len(hs)-$w+1, 1)),
       |          b -> list_filter(range(b+1, least(b+$w, len(hs))+1),
       |            p -> hs[p] = list_min(hs[b+1 : least(b+$w, len(hs))]))))),
       |      p -> substr(text, CAST(p AS INT), $k))) AS g
       |  FROM h WHERE len(hs) > 0),
       |cold AS (SELECT g FROM sel GROUP BY g HAVING COUNT(*) <= $dfCap),
       |s2 AS (SELECT doc_id, g FROM sel JOIN cold USING (g)),
       |p AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
       |  FROM s2 a JOIN s2 b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id, n_shared FROM p WHERE n_shared >= $minShared
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** Language ID, mirroring [[TextAnalysis.langId]]: CJK presence →
    * zh, else argmax of stopword hits with ties to the earlier
    * language code (the cascade checks codes in sorted order, so a
    * branch is reached only when every earlier language lost).
    */
  def langid: String = {
    val langs = TextAnalysis.stopwords.toSeq.sortBy(_._1)
    val scores = langs.map { case (code, ws) =>
      val hits = ws.map(word =>
        "(CASE WHEN regexp_matches(text, '(?i)(^|\\s)" + word +
          "(\\s|$)') THEN 1 ELSE 0 END)").mkString(" + ")
      s"    ($hits) AS s_$code"
    }.mkString(",\n")
    val codes = langs.map(_._1)
    val cascade = codes.zipWithIndex.map { case (code, i) =>
      val later = codes.drop(i + 1)
      val geq = later.map(o => s"s_$code >= s_$o").mkString(" AND ")
      val cond = if (later.isEmpty) s"s_$code > 0"
      else s"$geq AND s_$code > 0"
      s"    WHEN $cond THEN '$code'"
    }.mkString("\n")
    s"""WITH s AS (
       |  SELECT doc_id, lang, text,
       |$scores
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |$cascade
       |    ELSE 'und' END AS predicted_lang
       |  FROM s)
       |SELECT doc_id, lang, predicted_lang,
       |  CAST(lang = predicted_lang AS INT) AS correct
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** Duplicate clusters, mirroring [[Dedup.dedupClusters]]: the same
    * exact + ngram-Jaccard pair edges, with connected components
    * computed by a recursive CTE (min-label transitive closure —
    * tractable because dup clusters are tiny; the Spark side's
    * iterative propagation is the 100 TB formulation).
    */
  def dedupClusters(tau: Double = 0.6): String =
    clusterCtes(tau) + """
       |SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY id
       |ORDER BY doc_id""".stripMargin

  /** Curation verdict, mirroring [[Pipeline.curate]]: the cluster
    * CTEs above plus the corpus-stats quality keep rule, folded into
    * one keep/reason row per document.
    */
  def curate(tau: Double = 0.6): String =
    clusterCtes(tau) + """,
       |cl AS (SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY id),
       |q AS (
       |  SELECT doc_id,
       |    ((CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
       |       BETWEEN 5 AND 100000
       |     AND CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
       |       / greatest(length(text), 1) < 0.2) AS keep_q
       |  FROM documents)
       |SELECT q.doc_id AS doc_id,
       |  CASE WHEN NOT q.keep_q THEN 'quality'
       |       WHEN q.doc_id <> cl.cluster THEN 'duplicate'
       |       ELSE 'kept' END AS reason,
       |  CAST(q.keep_q AND q.doc_id = cl.cluster AS INT) AS keep,
       |  cl.cluster AS cluster
       |FROM q JOIN cl ON q.doc_id = cl.doc_id
       |ORDER BY doc_id""".stripMargin

  /** The shared pair-edge + transitive-closure CTE chain (no final
    * SELECT) behind [[dedupClusters]] and [[curate]].
    */
  private def clusterCtes(tau: Double): String =
    s"""WITH RECURSIVE w AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(ws) - 2, 0) + 1),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
       |  FROM w WHERE len(ws) >= 3),
       |ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS g FROM sh),
       |p AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    a.n_sh AS a_n, b.n_sh AS b_n, COUNT(*) AS inter
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |near AS (
       |  SELECT a_id, b_id FROM p
       |  WHERE round(CAST(inter AS DOUBLE) / (a_n + b_n - inter), 6) >= $tau),
       |exact AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM documents a JOIN documents b
       |    ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
       |allp AS (SELECT a_id, b_id FROM near UNION SELECT a_id, b_id FROM exact),
       |edges AS (SELECT a_id AS a, b_id AS b FROM allp
       |  UNION SELECT b_id AS a, a_id AS b FROM allp),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS lbl FROM documents
       |  UNION
       |  SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id)""".stripMargin

  /** HITS with the power iterations unrolled as chained CTEs —
    * identical FUSED arithmetic to [[graft.graph.Algorithms.hits]]
    * (one L1 normalization per full iteration on the hub side, raw
    * authority sums feed the hub sum directly, authorities normalized
    * once after the last iteration; absent scores coalesced to 0),
    * rounded to 6 dp on both sides like [[pagerank]].
    */
  def hits(iters: Int = 8): String = {
    // normalization deferred to the end on both engines (the linear
    // update commutes with scaling) — iterations carry RAW sums
    val iterCtes = (1 to iters).map { k =>
      s"""ra$k AS MATERIALIZED (
         |  SELECT e.dst AS id, SUM(h.hub) AS rawa
         |  FROM edges e JOIN h${k - 1} h ON e.src = h.id GROUP BY e.dst),
         |h$k AS MATERIALIZED (
         |  SELECT e.src AS id, SUM(ra.rawa) AS hub
         |  FROM edges e JOIN ra$k ra ON e.dst = ra.id GROUP BY e.src)""".stripMargin
    }.mkString(",\n") + s""",
         |hf AS MATERIALIZED (
         |  SELECT v.id, COALESCE(h.hub, 0.0::DOUBLE)/s.hnorm AS hub
         |  FROM verts v LEFT JOIN h$iters h ON v.id = h.id
         |  CROSS JOIN (SELECT SUM(hub) AS hnorm FROM h$iters) s),
         |a$iters AS MATERIALIZED (
         |  SELECT v.id, COALESCE(ra.rawa, 0.0::DOUBLE)/s.anorm AS auth
         |  FROM verts v LEFT JOIN ra$iters ra ON v.id = ra.id
         |  CROSS JOIN (SELECT SUM(rawa) AS anorm FROM ra$iters) s)""".stripMargin
    s"""WITH edges AS MATERIALIZED (
       |  SELECT 1000000000 + o_orderkey AS src, 2000000000 + o_custkey AS dst
       |  FROM orders
       |  UNION ALL
       |  SELECT 2000000000 + c_custkey AS src, 3000000000 + c_nationkey AS dst
       |  FROM customer
       |  UNION ALL
       |  SELECT 3000000000 + n_nationkey AS src, 4000000000 + n_regionkey AS dst
       |  FROM nation),
       |verts AS MATERIALIZED (
       |  SELECT DISTINCT id FROM (
       |    SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges)),
       |h0 AS MATERIALIZED (SELECT id, 1.0::DOUBLE AS hub FROM verts),
       |$iterCtes
       |SELECT h.id, round(h.hub, 6) AS hub, round(a.auth, 6) AS auth
       |FROM hf h JOIN a$iters a ON h.id = a.id ORDER BY h.id""".stripMargin
  }

  /** PageRank with the 10 power iterations unrolled as chained CTEs —
    * identical arithmetic to [[graft.graph.Algorithms.pageRank]]
    * (same double constants via `::DOUBLE` casts, same dangling-mass
    * redistribution), rounded to 6 dp on both sides.
    */
  def pagerank(iters: Int = 10): String = {
    // every CTE is MATERIALIZED: each iteration references its
    // predecessor twice (dangling mass + received), so plain inlining
    // would expand r0 2^iters times and exhaust file handles
    val iterCtes = (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS MATERIALIZED (
         |  SELECT v.id,
         |    (1.0::DOUBLE - 0.85::DOUBLE)/nv.n
         |      + 0.85::DOUBLE*(COALESCE(s.received, 0.0::DOUBLE) + d.dmass/nv.n) AS rank
         |  FROM verts v
         |  CROSS JOIN nv
         |  CROSS JOIN (SELECT COALESCE(SUM(r.rank), 0.0::DOUBLE) AS dmass
         |              FROM $prev r LEFT JOIN outdeg o ON r.id = o.src
         |              WHERE o.src IS NULL) d
         |  LEFT JOIN (SELECT e.dst AS id, SUM(r.rank / o.out_deg) AS received
         |             FROM edges e
         |             JOIN $prev r ON e.src = r.id
         |             JOIN outdeg o ON e.src = o.src
         |             GROUP BY e.dst) s ON v.id = s.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT 1000000000 + o_orderkey AS src, 2000000000 + o_custkey AS dst
       |  FROM orders
       |  UNION ALL
       |  SELECT 2000000000 + c_custkey AS src, 3000000000 + c_nationkey AS dst
       |  FROM customer
       |  UNION ALL
       |  SELECT 3000000000 + n_nationkey AS src, 4000000000 + n_regionkey AS dst
       |  FROM nation),
       |verts AS MATERIALIZED (
       |  SELECT DISTINCT id FROM (
       |    SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges)),
       |nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
       |outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
       |r0 AS MATERIALIZED (SELECT id, 1.0::DOUBLE/nv.n AS rank FROM verts CROSS JOIN nv),
       |$iterCtes
       |SELECT id, round(rank, 6) AS rank FROM r$iters ORDER BY id""".stripMargin
  }

  /** DuckDB twin of [[graft.graph.Algorithms.pprQuery]]: the pagerank
    * CTE skeleton with seed-restricted teleport — p_v = 1/|S| on the
    * seed set, 0 elsewhere; dangling mass restarts at the seeds.
    */
  def ppr(iters: Int = 10, seedMax: Int = 5): String = {
    val iterCtes = (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS MATERIALIZED (
         |  SELECT v.id,
         |    (1.0::DOUBLE - 0.85::DOUBLE)*v.p
         |      + 0.85::DOUBLE*(COALESCE(s.received, 0.0::DOUBLE) + d.dmass*v.p) AS rank
         |  FROM verts v
         |  CROSS JOIN (SELECT COALESCE(SUM(r.rank), 0.0::DOUBLE) AS dmass
         |              FROM $prev r LEFT JOIN outdeg o ON r.id = o.src
         |              WHERE o.src IS NULL) d
         |  LEFT JOIN (SELECT e.dst AS id, SUM(r.rank / o.out_deg) AS received
         |             FROM edges e
         |             JOIN $prev r ON e.src = r.id
         |             JOIN outdeg o ON e.src = o.src
         |             GROUP BY e.dst) s ON v.id = s.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT 1000000000 + o_orderkey AS src, 2000000000 + o_custkey AS dst
       |  FROM orders
       |  UNION ALL
       |  SELECT 2000000000 + c_custkey AS src, 3000000000 + c_nationkey AS dst
       |  FROM customer
       |  UNION ALL
       |  SELECT 3000000000 + n_nationkey AS src, 4000000000 + n_regionkey AS dst
       |  FROM nation),
       |seeds AS MATERIALIZED (
       |  SELECT 2000000000 + c_custkey AS id FROM customer
       |  WHERE c_custkey <= $seedMax),
       |ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM seeds),
       |verts AS MATERIALIZED (
       |  SELECT u.id,
       |    CASE WHEN s.id IS NOT NULL THEN 1.0::DOUBLE/ns.n
       |         ELSE 0.0::DOUBLE END AS p
       |  FROM (SELECT DISTINCT id FROM (
       |    SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges)) u
       |  LEFT JOIN seeds s USING (id) CROSS JOIN ns),
       |outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
       |r0 AS MATERIALIZED (SELECT id, p AS rank FROM verts),
       |$iterCtes
       |SELECT v.id, round(r.rank, 9) + 0.0 AS rank
       |FROM r$iters r JOIN verts v USING (id) ORDER BY v.id""".stripMargin
  }

  /** Deterministic k-means with the Lloyd iterations unrolled as
    * chained CTEs — identical arithmetic to
    * [[graft.operators.Similarity.kmeans]]: same first-k init, same
    * d² = v·v − 2·(v·c) + c·c fold, same decimal(28,12)-accumulated
    * 6-dp-rounded centroid updates, ties to the smaller cell id.
    */
  private def kmeansD2(e: String, c: String): String =
    s"list_dot_product($e, $e) - 2.0*list_dot_product($e, $c)" +
      s" + list_dot_product($c, $c)"

  /** Lloyd-iteration CTEs shared by [[kmeans]] and [[semanticDedup]]:
    * after these, `asg(vec_id, v, cell, d2)` holds the final
    * assignment — mirroring `Similarity.kmeansAssign`.
    */
  private def kmeansCtes(k: Int, iters: Int): String =
    kmeansCtesOn(k, iters, "", "CAST(embedding AS DOUBLE[])")

  /** [[kmeansCtes]] with a CTE-name prefix and an arbitrary vector
    * expression over `embeddings` — [[pq]] instantiates one block per
    * subvector slice; the final assignment lands in `${p}asg`.
    * `trainWhere` optionally restricts the LLOYD TRAINING set (the
    * `${p}t` CTE feeding init + iterations) — the final assignment
    * always covers the full `${p}e` frame, mirroring
    * `Similarity.annIvfPq`'s subsampled codebook training.
    */
  private def kmeansCtesOn(k: Int, iters: Int, p: String,
      vexpr: String, trainWhere: String = ""): String = {
    def d2 = kmeansD2 _
    val steps = (1 until iters).map { j =>
      s"""${p}a$j AS MATERIALIZED (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${d2("e.v", "c.cvec")}, c.cell) AS rk
         |    FROM ${p}t e CROSS JOIN ${p}c${j - 1} c) WHERE rk = 1),
         |${p}m$j AS (
         |  SELECT cell, d,
         |    round(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) AS m
         |  FROM (SELECT cell, unnest(v) AS x, generate_subscripts(v, 1) AS d
         |        FROM ${p}a$j)
         |  GROUP BY cell, d),
         |${p}c$j AS MATERIALIZED (
         |  SELECT c.cell, COALESCE(n.cvec, c.cvec) AS cvec
         |  FROM ${p}c${j - 1} c LEFT JOIN
         |    (SELECT cell, list(m ORDER BY d) AS cvec FROM ${p}m$j GROUP BY cell) n
         |    USING (cell))""".stripMargin
    }.mkString(",\n")
    s"""${p}e AS MATERIALIZED (
       |  SELECT vec_id, $vexpr AS v FROM embeddings),
       |${p}t AS MATERIALIZED (
       |  SELECT * FROM ${p}e $trainWhere),
       |${p}c0 AS MATERIALIZED (
       |  SELECT CAST(vec_id AS INT) AS cell, v AS cvec FROM ${p}e WHERE vec_id < $k),
       |$steps,
       |${p}asg AS MATERIALIZED (
       |  SELECT vec_id, v, cell, d2 FROM (
       |    SELECT e.vec_id, e.v, c.cell, ${d2("e.v", "c.cvec")} AS d2,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${d2("e.v", "c.cvec")}, c.cell) AS rk
       |    FROM ${p}e e CROSS JOIN ${p}c${iters - 1} c) WHERE rk = 1)""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.Similarity.pq]]: one kmeans CTE
    * block per subvector slice, unioned into (vec_id, sub, code,
    * dist2).
    */
  def pq(m: Int = 4, k: Int = 8, iters: Int = 3, dim: Int = 64): String = {
    val subDim = dim / m
    val blocks = (0 until m).map { s =>
      kmeansCtesOn(k, iters, s"s$s",
        s"(CAST(embedding AS DOUBLE[]))[${s * subDim + 1}:${s * subDim + subDim}]")
    }.mkString(",\n")
    val sel = (0 until m).map { s =>
      s"""SELECT vec_id, CAST($s AS BIGINT) AS sub, CAST(cell AS BIGINT) AS code,
         |  round(d2, 6) + 0.0 AS dist2 FROM s${s}asg""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $blocks
       |$sel
       |ORDER BY vec_id, sub""".stripMargin
  }

  def kmeans(k: Int = 8, iters: Int = 4): String =
    s"""WITH ${kmeansCtes(k, iters)}
       |SELECT vec_id, cell, round(d2, 6) + 0.0 AS dist2 FROM asg
       |ORDER BY vec_id""".stripMargin

  /** DuckDB twin of [[graft.operators.Similarity.semanticDedup]]:
    * identical clustering CTEs, then the within-cluster greedy
    * keep-lowest-id rule.
    */
  def semanticDedup(k: Int = 8, iters: Int = 4, tau: Double = 0.35): String =
    s"""WITH ${kmeansCtes(k, iters)},
       |nn AS (
       |  SELECT vec_id, v, cell, sqrt(list_dot_product(v, v)) AS nrm
       |  FROM asg),
       |pp AS (
       |  SELECT b.vec_id AS b_id, MIN(a.vec_id) AS dup_of
       |  FROM nn a JOIN nn b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0
       |    ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END, 6) >= $tau
       |  GROUP BY b.vec_id)
       |SELECT n.vec_id, n.cell, p.dup_of, p.dup_of IS NULL AS keep
       |FROM nn n LEFT JOIN pp p ON n.vec_id = p.b_id
       |ORDER BY n.vec_id""".stripMargin

  /** The DuckDB twin of [[graft.graph.Algorithms.labelPropagation]]
    * over the per-nation consecutive-customer graph: `rounds`
    * synchronous most-frequent-label steps (ties to the smallest
    * label) unrolled as CTEs.
    */
  /** DuckDB twin of [[graft.graph.Algorithms.degreeDistQuery]]. */
  def degreeDist: String =
    """WITH edges AS (
      |  SELECT 1000000000 + o_orderkey AS src, 2000000000 + o_custkey AS dst
      |  FROM orders
      |  UNION ALL
      |  SELECT 2000000000 + c_custkey AS src, 3000000000 + c_nationkey AS dst
      |  FROM customer
      |  UNION ALL
      |  SELECT 3000000000 + n_nationkey AS src, 4000000000 + n_regionkey AS dst
      |  FROM nation),
      |d AS (
      |  SELECT id, SUM(out_d) AS out_degree, SUM(in_d) AS in_degree FROM (
      |    SELECT src AS id, 1 AS out_d, 0 AS in_d FROM edges
      |    UNION ALL
      |    SELECT dst AS id, 0 AS out_d, 1 AS in_d FROM edges)
      |  GROUP BY id),
      |b AS (
      |  SELECT 'out' AS direction,
      |    CAST(length(bin(out_degree)) - 1 AS BIGINT) AS bucket
      |  FROM d WHERE out_degree > 0
      |  UNION ALL
      |  SELECT 'in' AS direction,
      |    CAST(length(bin(in_degree)) - 1 AS BIGINT) AS bucket
      |  FROM d WHERE in_degree > 0)
      |SELECT direction, bucket, COUNT(*) AS n_nodes
      |FROM b GROUP BY 1, 2 ORDER BY direction, bucket""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.clusterStats]]: the
    * cluster CTEs plus a size histogram.
    */
  def clusterStats(tau: Double = 0.6): String =
    clusterCtes(tau) + """,
      |cl AS (SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY id),
      |szs AS (SELECT cluster, COUNT(*) AS sz FROM cl GROUP BY 1)
      |SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
      |  CAST(COUNT(*) * sz AS BIGINT) AS n_docs
      |FROM szs GROUP BY sz ORDER BY cluster_size""".stripMargin

  /** DuckDB twin of [[graft.operators.Search.nameClusters]]: the
    * SymSpell pair CTEs, a recursive transitive closure over the
    * shared poly-hash name ids, canonical = min hash id per
    * component.
    */
  def nameClusters(): String =
    s"""WITH RECURSIVE names AS (
       |  SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts
       |  FROM part GROUP BY 1),
       |nid AS (SELECT name, n_parts, ${polySql("name")} AS nid FROM names),
       |vr AS (
       |  SELECT name, unnest(list_distinct(list_append(
       |    list_transform(range(1, len(name) + 1),
       |      i -> substr(name, 1, CAST(i - 1 AS BIGINT)) ||
       |           substr(name, CAST(i + 1 AS BIGINT), len(name))),
       |    name))) AS v
       |  FROM names),
       |vh AS (SELECT DISTINCT name, md5(v) AS h FROM vr),
       |cand AS (
       |  SELECT DISTINCT a.name AS a_name, b.name AS b_name
       |  FROM vh a JOIN vh b ON a.h = b.h AND a.name < b.name),
       |ver AS (
       |  SELECT a_name, b_name FROM cand
       |  WHERE levenshtein(a_name, b_name) <= 1),
       |edges AS (
       |  SELECT na.nid AS src, nb.nid AS dst
       |  FROM ver JOIN nid na ON ver.a_name = na.name
       |  JOIN nid nb ON ver.b_name = nb.name),
       |bidir AS (SELECT src, dst FROM edges
       |  UNION ALL SELECT dst AS src, src AS dst FROM edges),
       |reach AS (
       |  SELECT nid AS id, nid AS lbl FROM nid
       |  UNION
       |  SELECT e.dst AS id, r.lbl FROM reach r JOIN bidir e ON e.src = r.id),
       |cl AS (SELECT id, MIN(lbl) AS cid FROM reach GROUP BY 1)
       |SELECT n.name AS name, cn.name AS canonical, n.n_parts
       |FROM nid n JOIN cl ON n.nid = cl.id JOIN nid cn ON cl.cid = cn.nid
       |ORDER BY n.name""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.sourceRates]]: shared
    * cluster closure, per-source canonical share.
    */
  def sourceRates(tau: Double = 0.6): String =
    clusterCtes(tau) + """,
      |cl AS (SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY id)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN d.doc_id = cl.cluster THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_canonical,
      |  round(1.0 - CAST(SUM(CASE WHEN d.doc_id = cl.cluster
      |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) + 0.0 AS dup_rate
      |FROM documents d JOIN cl ON d.doc_id = cl.doc_id
      |GROUP BY 1 ORDER BY source""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.sourceOverlapMatrix]]:
    * shared cluster closure, per-(cluster, source) counts, pair join
    * (the ≥-2-sources gate is implicit in `a.source < b.source`).
    */
  def sourceOverlapMatrix(tau: Double = 0.6): String =
    clusterCtes(tau) + """,
      |cl AS (SELECT id AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY id),
      |cs AS (
      |  SELECT cl.cluster, d.source, COUNT(*) AS n
      |  FROM documents d JOIN cl ON d.doc_id = cl.doc_id
      |  GROUP BY 1, 2)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_shared_clusters,
      |  CAST(SUM(a.n + b.n) AS BIGINT) AS n_docs_involved
      |FROM cs a JOIN cs b ON a.cluster = b.cluster AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  def labelProp(rounds: Int = 3): String =
    s"""WITH ${labelPropCtes(rounds)}
       |SELECT id, label AS community FROM l$rounds ORDER BY id""".stripMargin

  /** Twin of [[graft.graph.Algorithms.labelPropAsyncQuery]] — the
    * parity-scheduled rounds unrolled: round j's candidate aggregate
    * only covers sources of color j % 2, everything else identical to
    * [[labelProp]].
    */
  def labelPropAsync(rounds: Int = 4): String =
    s"""WITH ${labelPropCtes(rounds, parityScheduled = true)}
       |SELECT id, label AS community FROM l$rounds ORDER BY id""".stripMargin

  /** The label-propagation CTE block (graph `e`/`s0`, final labels in
    * `l$rounds`) shared by [[labelProp]], [[labelPropAsync]], and
    * [[modularity]]. `parityScheduled` adds the semi-synchronous
    * color filter: round j only updates sources with id % 2 = j % 2.
    */
  private def labelPropCtes(rounds: Int,
      parityScheduled: Boolean = false): String = {
    val steps = (1 to rounds).map { j =>
      val parity = if (parityScheduled) s" WHERE s.src % 2 = ${j % 2}" else ""
      s"""n$j AS (
         |  SELECT s.src, l.label, COUNT(*) AS cnt
         |  FROM s0 s JOIN l${j - 1} l ON s.dst = l.id$parity GROUP BY 1, 2),
         |b$j AS (
         |  SELECT src AS id, label FROM (
         |    SELECT src, label, row_number() OVER (
         |      PARTITION BY src ORDER BY cnt DESC, label) AS rk FROM n$j)
         |  WHERE rk = 1),
         |l$j AS MATERIALIZED (
         |  SELECT l.id, COALESCE(b.label, l.label) AS label
         |  FROM l${j - 1} l LEFT JOIN b$j b USING (id))""".stripMargin
    }.mkString(",\n")
    s"""nb AS (
       |  SELECT c_custkey AS src,
       |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
       |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2
       |  FROM customer),
       |e AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, d1 AS dst FROM nb UNION ALL SELECT src, d2 AS dst FROM nb)
       |  WHERE dst IS NOT NULL),
       |s0 AS MATERIALIZED (SELECT src, dst FROM e
       |  UNION ALL SELECT dst AS src, src AS dst FROM e),
       |l0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS id, src AS label FROM s0),
       |$steps""".stripMargin
  }

  /** DuckDB twin of [[graft.graph.Algorithms.modularityQuery]]:
    * label-prop CTEs, then per-community Newman modularity parts from
    * exact integer aggregates.
    */
  def modularity(rounds: Int = 3): String =
    s"""WITH ${labelPropCtes(rounds)},
       |lab AS MATERIALIZED (SELECT id, label AS community FROM l$rounds),
       |mm AS (SELECT COUNT(*) AS m FROM e),
       |deg AS (SELECT src AS id, COUNT(*) AS deg FROM s0 GROUP BY 1),
       |cdeg AS (
       |  SELECT community, COUNT(*) AS n_nodes, CAST(SUM(deg) AS BIGINT) AS deg_sum
       |  FROM lab JOIN deg USING (id) GROUP BY 1),
       |intra AS (
       |  SELECT la.community, COUNT(*) AS m_intra
       |  FROM e JOIN lab la ON e.src = la.id JOIN lab lb ON e.dst = lb.id
       |  WHERE la.community = lb.community GROUP BY 1)
       |SELECT c.community, c.n_nodes,
       |  COALESCE(i.m_intra, 0) AS m_intra, c.deg_sum,
       |  round(CAST(COALESCE(i.m_intra, 0) AS DOUBLE) / mm.m -
       |    (CAST(c.deg_sum AS DOUBLE) / (2 * mm.m)) *
       |    (CAST(c.deg_sum AS DOUBLE) / (2 * mm.m)), 9) + 0.0 AS q_part
       |FROM cdeg c LEFT JOIN intra i USING (community) CROSS JOIN mm
       |ORDER BY community""".stripMargin

  /** DuckDB twin of [[graft.graph.Algorithms.louvainQuery]]:
    * synchronous Louvain local-moving rounds unrolled as CTEs over
    * the same per-nation consecutive-customer graph. The gain
    * comparison (`2m·k_{i,c} − k_i·Σtot'(c)`) is exact integer
    * arithmetic on both engines, ties to the smallest community id;
    * the reporting tail is [[modularity]]'s.
    */
  def louvain(rounds: Int = 3): String =
    s"""WITH ${louvainBaseCtes()},
       |c0 AS MATERIALIZED (
       |  SELECT src AS id, src AS comm, COUNT(*) AS deg
       |  FROM s0 GROUP BY src),
       |${louvainSteps("c", "s0", weighted = false, rounds)}
       |${louvainTail(s"c$rounds")}""".stripMargin

  /** DuckDB twin of [[graft.graph.Algorithms.louvain2Query]]:
    * phase-1 rounds, contraction into the weighted supernode graph
    * (coarse degree = community degree mass), phase-2 rounds over the
    * coarse graph, projection back, same reporting tail.
    */
  def louvain2(r1: Int = 2, r2: Int = 2): String =
    s"""WITH ${louvainBaseCtes()},
       |c0 AS MATERIALIZED (
       |  SELECT src AS id, src AS comm, COUNT(*) AS deg
       |  FROM s0 GROUP BY src),
       |${louvainSteps("c", "s0", weighted = false, r1)},
       |ce AS MATERIALIZED (
       |  SELECT la.comm AS ca, lb.comm AS cb
       |  FROM e JOIN c$r1 la ON e.src = la.id JOIN c$r1 lb ON e.dst = lb.id
       |  WHERE la.comm <> lb.comm),
       |csym AS MATERIALIZED (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
       |    SELECT ca AS src, cb AS dst FROM ce
       |    UNION ALL SELECT cb AS src, ca AS dst FROM ce)
       |  GROUP BY 1, 2),
       |g0 AS MATERIALIZED (
       |  SELECT comm AS id, comm, CAST(SUM(deg) AS BIGINT) AS deg
       |  FROM c$r1 GROUP BY 1, 2),
       |${louvainSteps("g", "csym", weighted = true, r2)},
       |proj AS MATERIALIZED (
       |  SELECT c.id, g.comm, c.deg
       |  FROM c$r1 c JOIN g$r2 g ON c.comm = g.id)
       |${louvainTail("proj")}""".stripMargin

  /** DuckDB twin of [[graft.graph.Algorithms.louvain3Query]]: the
    * fixpoint level loop unrolled as `maxLevels` level blocks. Each
    * block computes the level's local-moving candidate (the shared
    * [[louvainSteps]], uniformly weighted — base weights 1), tests
    * the SHRINK rule (`#communities < #nodes`) in a 1-row flag CTE,
    * and conditionally either contracts (nodes/edges/projection) or
    * passes the carried state through. After the first non-shrinking
    * level the carried state reproduces itself, so the remaining
    * unrolled blocks are no-ops — exactly the engine's early stop.
    */
  def louvain3(r: Int = 2, maxLevels: Int = 4): String = {
    val levels = (1 to maxLevels).map { j =>
      val p = s"v${j}_"
      val cand = s"$p$r"
      s"""${p}0 AS (SELECT id, comm, deg FROM nl${j - 1}),
         |${louvainSteps(p, s"sw${j - 1}", weighted = true, r)},
         |cd$j AS (
         |  SELECT (SELECT COUNT(DISTINCT comm) FROM $cand) <
         |         (SELECT COUNT(*) FROM nl${j - 1}) AS shrunk),
         |nl$j AS MATERIALIZED (
         |  SELECT comm AS id, comm, CAST(SUM(deg) AS BIGINT) AS deg
         |  FROM $cand, cd$j WHERE cd$j.shrunk GROUP BY 1, 2
         |  UNION ALL
         |  SELECT id, comm, deg FROM nl${j - 1}, cd$j WHERE NOT cd$j.shrunk),
         |sw$j AS MATERIALIZED (
         |  SELECT la.comm AS src, lb.comm AS dst, CAST(SUM(s.w) AS BIGINT) AS w
         |  FROM sw${j - 1} s
         |  JOIN $cand la ON s.src = la.id JOIN $cand lb ON s.dst = lb.id, cd$j
         |  WHERE cd$j.shrunk AND la.comm <> lb.comm GROUP BY 1, 2
         |  UNION ALL
         |  SELECT src, dst, w FROM sw${j - 1}, cd$j WHERE NOT cd$j.shrunk),
         |pr$j AS MATERIALIZED (
         |  SELECT p.id, c.comm, p.deg
         |  FROM pr${j - 1} p JOIN $cand c ON p.comm = c.id, cd$j
         |  WHERE cd$j.shrunk
         |  UNION ALL
         |  SELECT id, comm, deg FROM pr${j - 1}, cd$j WHERE NOT cd$j.shrunk)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ${louvainBaseCtes()},
       |sw0 AS MATERIALIZED (
       |  SELECT src, dst, CAST(1 AS BIGINT) AS w FROM s0),
       |nl0 AS MATERIALIZED (
       |  SELECT src AS id, src AS comm, COUNT(*) AS deg
       |  FROM s0 GROUP BY src),
       |pr0 AS (SELECT id, comm, deg FROM nl0),
       |$levels
       |${louvainTail(s"pr$maxLevels")}""".stripMargin
  }

  /** Base-graph CTEs of the Louvain family: `nb`/`e`/`s0`/`mm`. */
  private def louvainBaseCtes(): String =
    s"""nb AS (
       |  SELECT c_custkey AS src,
       |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
       |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2
       |  FROM customer),
       |e AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, d1 AS dst FROM nb UNION ALL SELECT src, d2 AS dst FROM nb)
       |  WHERE dst IS NOT NULL),
       |s0 AS MATERIALIZED (SELECT src, dst FROM e
       |  UNION ALL SELECT dst AS src, src AS dst FROM e),
       |mm AS (SELECT COUNT(*) AS m FROM e)""".stripMargin

  /** One synchronous local-moving CTE chain: frames `${p}1..${p}N`
    * over symmetrized edge table `sym` (weight column `w` when
    * `weighted`), starting from `${p}0`.
    */
  private def louvainSteps(p: String, sym: String, weighted: Boolean,
      rounds: Int): String = {
    val kexpr = if (weighted) "SUM(s.w)" else "COUNT(*)"
    (1 to rounds).map { j =>
      s"""t$p$j AS (SELECT comm, SUM(deg) AS tot FROM $p${j - 1} GROUP BY 1),
         |k$p$j AS (
         |  SELECT s.src, c.comm AS nc, CAST($kexpr AS BIGINT) AS kic
         |  FROM $sym s JOIN $p${j - 1} c ON s.dst = c.id GROUP BY 1, 2),
         |u$p$j AS (
         |  SELECT src, nc, CAST(SUM(kic) AS BIGINT) AS kic FROM (
         |    SELECT src, nc, kic FROM k$p$j
         |    UNION ALL SELECT id AS src, comm AS nc, 0 AS kic FROM $p${j - 1})
         |  GROUP BY 1, 2),
         |$p$j AS MATERIALIZED (
         |  SELECT src AS id,
         |    CASE WHEN (src + $j) % 2 = 0 THEN nc ELSE oc END AS comm,
         |    ki AS deg FROM (
         |    SELECT u.src, u.nc, c.comm AS oc, c.deg AS ki, row_number() OVER (
         |      PARTITION BY u.src ORDER BY
         |        2 * mm.m * u.kic - c.deg *
         |          (CASE WHEN u.nc = c.comm THEN t.tot - c.deg
         |                ELSE t.tot END) DESC, u.nc) AS rk
         |    FROM u$p$j u JOIN $p${j - 1} c ON u.src = c.id
         |    JOIN t$p$j t ON u.nc = t.comm CROSS JOIN mm)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
  }

  /** The per-community modularity reporting tail over a final
    * (id, comm, deg) frame.
    */
  private def louvainTail(frame: String): String =
    s""",
       |lab AS MATERIALIZED (SELECT id, comm AS community, deg FROM $frame),
       |cdeg AS (
       |  SELECT community, COUNT(*) AS n_nodes,
       |    CAST(SUM(deg) AS BIGINT) AS deg_sum
       |  FROM lab GROUP BY 1),
       |intra AS (
       |  SELECT la.community, COUNT(*) AS m_intra
       |  FROM e JOIN lab la ON e.src = la.id JOIN lab lb ON e.dst = lb.id
       |  WHERE la.community = lb.community GROUP BY 1)
       |SELECT c.community, c.n_nodes,
       |  COALESCE(i.m_intra, 0) AS m_intra, c.deg_sum,
       |  round(CAST(COALESCE(i.m_intra, 0) AS DOUBLE) / mm.m -
       |    (CAST(c.deg_sum AS DOUBLE) / (2 * mm.m)) *
       |    (CAST(c.deg_sum AS DOUBLE) / (2 * mm.m)), 9) + 0.0 AS q_part
       |FROM cdeg c LEFT JOIN intra i USING (community) CROSS JOIN mm
       |ORDER BY community""".stripMargin

  /** The DuckDB twin of [[graft.graph.Algorithms.kcorePeel]] over the
    * per-nation consecutive-customer graph: exactly `rounds` peeling
    * steps unrolled as CTEs (same rounds-bounded contract as the
    * operator).
    */
  def kcorePeel(k: Int = 3, rounds: Int = 4): String = {
    val steps = (1 to rounds).map { j =>
      s"""k$j AS MATERIALIZED (
         |  SELECT src FROM s${j - 1} GROUP BY src HAVING COUNT(*) >= $k),
         |s$j AS MATERIALIZED (
         |  SELECT s.src, s.dst FROM s${j - 1} s
         |  JOIN k$j a ON s.src = a.src JOIN k$j b ON s.dst = b.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH nb AS (
       |  SELECT c_custkey AS src,
       |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
       |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2
       |  FROM customer),
       |e AS (SELECT src, dst FROM (
       |  SELECT src, d1 AS dst FROM nb UNION ALL SELECT src, d2 AS dst FROM nb)
       |  WHERE dst IS NOT NULL),
       |s0 AS MATERIALIZED (SELECT src, dst FROM e
       |  UNION ALL SELECT dst AS src, src AS dst FROM e),
       |$steps
       |SELECT src AS id, COUNT(*) AS deg FROM s$rounds
       |GROUP BY src ORDER BY id""".stripMargin
  }

  /** The DuckDB twin of [[Similarity.planesFor]]: smallest k in
    * [4, 16] with 32·2^k >= n — shift-and-compare, no float log, so
    * both engines derive the identical plane count from the same
    * corpus count.
    */
  private def planesForSql: String =
    "(SELECT MIN(k) FROM range(4, 17) t(k) " +
      "WHERE (32::BIGINT << k) >= cnt.n OR k = 16)"

  /** The 16 plane literals (the planesFor clamp bound), gated on
    * `p < nbits` — the SQL twin of Spark's plan-time `(0 until np)`
    * term list, for an `nbits` only known from the data's COUNT(*).
    */
  private def gatedBucketExpr(dims: Int): String =
    (0 until 16).map { p =>
      val planeList = (0 until dims).map(d => Similarity.planeComponent(p, d))
        .mkString("[", ", ", "]")
      s"(CASE WHEN $p < nbits AND list_dot_product(v, $planeList) >= 0.0 " +
        s"THEN ${1L << p}::BIGINT ELSE 0 END)"
    }.mkString("\n      + ")

  /** Embedding near-dup via LSH bucket blocking, mirroring
    * [[Similarity.embCosineDup]]: same corpus-count-derived plane
    * count, same plane literals, same Hamming-≤radius probe masks
    * (enumerated in-SQL from the derived nbits), same exact-cosine
    * verify.
    */
  def embCosineDup(tau: Double = 0.35, radius: Int = 2,
      dims: Int = 64): String = {
    s"""WITH cnt AS (SELECT COUNT(*) AS n FROM embeddings),
       |nb AS (SELECT $planesForSql AS nbits FROM cnt),
       |n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |bk AS (
       |  SELECT n.*, nbits, ${gatedBucketExpr(dims)} AS bucket
       |  FROM n CROSS JOIN nb),
       |pr AS (
       |  SELECT b_id, b_v, b_nrm, xor(bucket, m) AS probe FROM (
       |    SELECT vec_id AS b_id, v AS b_v, nrm AS b_nrm, bucket,
       |      unnest(list_filter(range(0, (1::BIGINT << nbits)),
       |        m -> bit_count(m) <= $radius)) AS m
       |    FROM bk)),
       |cand AS (
       |  SELECT a.vec_id AS a_id, b.b_id,
       |    round(CASE WHEN a.nrm = 0 OR b.b_nrm = 0 THEN 0
       |      ELSE list_dot_product(a.v, b.b_v) / (a.nrm * b.b_nrm) END, 6) + 0.0 AS cosine
       |  FROM bk a JOIN pr b ON a.bucket = b.probe AND a.vec_id < b.b_id)
       |SELECT a_id, b_id, cosine FROM cand
       |WHERE cosine >= $tau ORDER BY a_id, b_id""".stripMargin
  }

  /** ANN via random-hyperplane LSH, mirroring [[Similarity.annLsh]]:
    * the plane constants are the SAME Scala-computed double literals
    * that sit in the Spark plan (Double.toString round-trips exactly),
    * so bucket assignment and probing agree.
    */
  /** The CTE pipeline shared by [[annLsh]] and [[annRecall]]: vectors
    * normed and bucketed, queries multi-probed, LSH candidates ranked
    * into `r`.
    */
  private def annLshCtes(dims: Int): String =
    s"""cnt AS (SELECT COUNT(*) AS n FROM embeddings),
       |nb AS (SELECT $planesForSql AS nbits FROM cnt),
       |n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |bk AS (
       |  SELECT n.*, nbits, ${gatedBucketExpr(dims)} AS bucket
       |  FROM n CROSS JOIN nb),
       |q AS (
       |  SELECT q_id, q_v, q_nrm, xor(bucket, m) AS probe FROM (
       |    SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm, bucket,
       |      unnest(list_filter(range(0, (1::BIGINT << nbits)),
       |        m -> bit_count(m) <= 1)) AS m
       |    FROM bk WHERE vec_id < 5)),
       |d AS (SELECT vec_id, v, nrm, bucket FROM bk WHERE vec_id >= 5),
       |s AS (
       |  SELECT q.q_id, d.vec_id,
       |    round(CASE WHEN d.nrm = 0 OR q.q_nrm = 0 THEN 0
       |      ELSE list_dot_product(d.v, q.q_v) / (d.nrm * q.q_nrm) END, 6) + 0.0 AS score
       |  FROM d JOIN q ON d.bucket = q.probe),
       |r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM s)""".stripMargin

  def annLsh(k: Int = 10, dims: Int = 64): String = {
    s"""WITH ${annLshCtes(dims)}
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, score
       |FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** DuckDB twin of [[Similarity.recallEval]]: the LSH candidates'
    * top-k left-joined against the exact brute-force top-k per query,
    * recall = hits / k.
    */
  def annRecall(k: Int = 10, dims: Int = 64): String = {
    s"""WITH ${annLshCtes(dims)},
       |ann AS (SELECT q_id, vec_id FROM r WHERE rank <= $k),
       |ex_s AS (
       |  SELECT q.vec_id AS q_id, d.vec_id,
       |    round(CASE WHEN d.nrm = 0 OR q.nrm = 0 THEN 0
       |      ELSE list_dot_product(d.v, q.v) / (d.nrm * q.nrm) END, 6) + 0.0 AS score
       |  FROM (SELECT * FROM n WHERE vec_id >= 5) d
       |  CROSS JOIN (SELECT * FROM n WHERE vec_id < 5) q),
       |ex_r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM ex_s),
       |exact AS (SELECT q_id, vec_id FROM ex_r WHERE rank <= $k)
       |SELECT exact.q_id, CAST(COUNT(ann.vec_id) AS BIGINT) AS n_hit,
       |  round(CAST(COUNT(ann.vec_id) AS DOUBLE) / $k, 6) + 0.0 AS recall_at_k
       |FROM exact LEFT JOIN ann
       |  ON exact.q_id = ann.q_id AND exact.vec_id = ann.vec_id
       |GROUP BY exact.q_id ORDER BY exact.q_id""".stripMargin
  }

  /** DuckDB twin of [[Similarity.annTuning]]: shared exact top-k,
    * then per (planes, probe-radius) grid cell the same plane
    * literals, probe masks, candidate join, top-k and recall
    * aggregate, unioned into the tuning curve.
    */
  def annTuning(k: Int = 10, dims: Int = 64): String = {
    val exactCtes =
      s"""n AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |ex_s AS (
         |  SELECT q.vec_id AS q_id, d.vec_id,
         |    round(CASE WHEN d.nrm = 0 OR q.nrm = 0 THEN 0
         |      ELSE list_dot_product(d.v, q.v) / (d.nrm * q.nrm) END, 6) + 0.0 AS score
         |  FROM (SELECT * FROM n WHERE vec_id >= 5) d
         |  CROSS JOIN (SELECT * FROM n WHERE vec_id < 5) q),
         |ex_r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM ex_s),
         |exact AS (SELECT q_id, vec_id FROM ex_r WHERE rank <= $k)""".stripMargin
    val grid = for (p <- Seq(6, 10, 14); h <- Seq(0, 1, 2)) yield (p, h)
    val cells = grid.zipWithIndex.map { case ((np, h), i) =>
      val bucketExpr = (0 until np).map { p =>
        val planeList = (0 until dims).map(d => Similarity.planeComponent(p, d))
          .mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $planeList) >= 0.0 " +
          s"THEN ${1L << p}::BIGINT ELSE 0 END)"
      }.mkString("\n      + ")
      s"""bk$i AS (SELECT n.*, $bucketExpr AS bucket FROM n),
         |q$i AS (
         |  SELECT q_id, q_v, q_nrm, xor(bucket, m) AS probe FROM (
         |    SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm, bucket,
         |      unnest(list_filter(range(0, (1::BIGINT << $np)),
         |        m -> bit_count(m) <= $h)) AS m
         |    FROM bk$i WHERE vec_id < 5)),
         |cand$i AS (
         |  SELECT q.q_id, d.vec_id,
         |    round(CASE WHEN d.nrm = 0 OR q.q_nrm = 0 THEN 0
         |      ELSE list_dot_product(d.v, q.q_v) / (d.nrm * q.q_nrm) END, 6) + 0.0 AS score
         |  FROM (SELECT * FROM bk$i WHERE vec_id >= 5) d
         |  JOIN q$i q ON d.bucket = q.probe),
         |ann$i AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
         |    FROM cand$i) WHERE rank <= $k),
         |rec$i AS (
         |  SELECT round(avg(CAST(n_hit AS DOUBLE) / $k), 6) + 0.0 AS mean_recall
         |  FROM (
         |    SELECT exact.q_id, COUNT(ann$i.vec_id) AS n_hit
         |    FROM exact LEFT JOIN ann$i
         |      ON exact.q_id = ann$i.q_id AND exact.vec_id = ann$i.vec_id
         |    GROUP BY exact.q_id)),
         |vol$i AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_candidates
         |          FROM cand$i)""".stripMargin
    }.mkString(",\n")
    val rows = grid.zipWithIndex.map { case ((np, h), i) =>
      s"""SELECT CAST($np AS BIGINT) AS n_planes,
         |  CAST($h AS BIGINT) AS probe_hamming, mean_recall, total_candidates
         |FROM rec$i CROSS JOIN vol$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $exactCtes,
       |$cells
       |$rows
       |ORDER BY n_planes, probe_hamming""".stripMargin
  }

  /** The IVF cell-assignment CTE block shared by [[ivfTuning]] and
    * [[annIvfPq]]: label centroids as the coarse quantizer, every
    * vector ranked against every cell (`assign` with rk), data side
    * `d` (nearest cell only), query side `qall` (all cell ranks).
    */
  private val IvfCellCtes: String =
    """ex AS (
      |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
      |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS d
      |  FROM embeddings),
      |cd AS (
      |  SELECT label, d,
      |    round(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) AS c
      |  FROM ex GROUP BY label, d),
      |cent AS (SELECT label AS cell, list(c ORDER BY d) AS cvec
      |         FROM cd GROUP BY label),
      |n AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                          CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |assign AS (
      |  SELECT vec_id, v, nrm, cell,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY
      |      list_dot_product(v, v) - 2.0*list_dot_product(v, cvec)
      |        + list_dot_product(cvec, cvec), cell) AS rk
      |  FROM n CROSS JOIN cent),
      |d AS (SELECT cell, vec_id, v, nrm FROM assign
      |      WHERE rk = 1 AND vec_id >= 5),
      |qall AS (SELECT cell, rk, vec_id AS q_id, v AS q_v, nrm AS q_nrm
      |         FROM assign WHERE vec_id < 5)""".stripMargin

  /** DuckDB twin of [[Similarity.annIvfPq]]: the IVF cell block +
    * one PQ kmeans block per subspace; a candidate's ADC is the
    * left-assoc sum `0.0 + t0 + … + t_{m-1}` of per-subspace
    * d²(query-slice, assigned-codebook-centroid) — the same fixed
    * fold order as the engine's in-row aggregate — then the `cand`
    * shortlist re-ranks by exact cosine.
    */
  def annIvfPq(k: Int = 10, nprobe: Int = 2, m: Int = 4, cb: Int = 8,
      iters: Int = 3, dim: Int = 64, cand: Int = 50,
      trainMod: Int = 4): String = {
    import graft.OracleHash.{MulA, MulB, P}
    val subDim = dim / m
    val pqBlocks = (0 until m).map { s =>
      kmeansCtesOn(cb, iters, s"s$s",
        s"(CAST(embedding AS DOUBLE[]))[${s * subDim + 1}:${s * subDim + subDim}]",
        trainWhere =
          s"WHERE (($MulA * vec_id + $MulB) % $P) % $trainMod = 0")
    }.mkString(",\n")
    val codeCols = (0 until m).map(s => s"a$s.cell AS k$s").mkString(", ")
    val codeJoins = (1 until m)
      .map(s => s"JOIN s${s}asg a$s USING (vec_id)").mkString(" ")
    val cbJoins = (0 until m)
      .map(s => s"JOIN s${s}c${iters - 1} cb$s ON cb$s.cell = c.k$s")
      .mkString("\n  ")
    val adcTerms = (0 until m).map { s =>
      val lo = s * subDim + 1
      val hi = s * subDim + subDim
      s"(${kmeansD2(s"q.v[$lo:$hi]", s"cb$s.cvec")})"
    }.mkString(" + ")
    s"""WITH $IvfCellCtes,
       |$pqBlocks,
       |codes AS (
       |  SELECT a0.vec_id, $codeCols
       |  FROM s0asg a0 $codeJoins
       |  WHERE a0.vec_id >= 5),
       |qv AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS v
       |       FROM embeddings WHERE vec_id < 5),
       |probes AS (SELECT cell, q_id FROM qall WHERE rk <= $nprobe),
       |candadc AS (
       |  SELECT p.q_id, dd.vec_id, dd.v, dd.nrm,
       |    round(0.0 + $adcTerms, 6) AS adc
       |  FROM d dd JOIN probes p USING (cell)
       |  JOIN codes c ON c.vec_id = dd.vec_id
       |  JOIN qv q ON q.q_id = p.q_id
       |  $cbJoins),
       |shortlist AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY q_id ORDER BY adc, vec_id) AS crk
       |    FROM candadc) WHERE crk <= $cand),
       |scored AS (
       |  SELECT s.q_id, s.vec_id,
       |    round(CASE WHEN s.nrm = 0 OR nq.nrm = 0 THEN 0
       |      ELSE list_dot_product(s.v, nq.v) / (s.nrm * nq.nrm) END, 6)
       |      + 0.0 AS score
       |  FROM shortlist s JOIN n nq ON nq.vec_id = s.q_id)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, score FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** DuckDB twin of [[Similarity.ivfTuning]]: shared label-centroid
    * assignment + exact top-k, then per-nprobe the probe join, top-k,
    * recall aggregate and candidate count, unioned into the curve.
    */
  def ivfTuning(k: Int = 10): String = {
    val cells = Seq(1, 2, 4).zipWithIndex.map { case (p, i) =>
      s"""q$i AS (SELECT cell, q_id, q_v, q_nrm FROM qall WHERE rk <= $p),
         |cand$i AS (
         |  SELECT q.q_id, d.vec_id,
         |    round(CASE WHEN d.nrm = 0 OR q.q_nrm = 0 THEN 0
         |      ELSE list_dot_product(d.v, q.q_v) / (d.nrm * q.q_nrm) END, 6)
         |      + 0.0 AS score
         |  FROM d JOIN q$i q USING (cell)),
         |ann$i AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
         |    FROM cand$i) WHERE rank <= $k),
         |rec$i AS (
         |  SELECT round(avg(CAST(n_hit AS DOUBLE) / $k), 6) + 0.0 AS mean_recall
         |  FROM (
         |    SELECT exact.q_id, COUNT(ann$i.vec_id) AS n_hit
         |    FROM exact LEFT JOIN ann$i
         |      ON exact.q_id = ann$i.q_id AND exact.vec_id = ann$i.vec_id
         |    GROUP BY exact.q_id)),
         |vol$i AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_candidates
         |          FROM cand$i)""".stripMargin
    }.mkString(",\n")
    val rows = Seq(1, 2, 4).zipWithIndex.map { case (p, i) =>
      s"""SELECT CAST($p AS BIGINT) AS nprobe, mean_recall, total_candidates
         |FROM rec$i CROSS JOIN vol$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $IvfCellCtes,
       |ex_s AS (
       |  SELECT q.vec_id AS q_id, dd.vec_id,
       |    round(CASE WHEN dd.nrm = 0 OR q.nrm = 0 THEN 0
       |      ELSE list_dot_product(dd.v, q.v) / (dd.nrm * q.nrm) END, 6)
       |      + 0.0 AS score
       |  FROM (SELECT * FROM n WHERE vec_id >= 5) dd
       |  CROSS JOIN (SELECT * FROM n WHERE vec_id < 5) q),
       |ex_r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM ex_s),
       |exact AS (SELECT q_id, vec_id FROM ex_r WHERE rank <= $k),
       |$cells
       |$rows
       |ORDER BY nprobe""".stripMargin
  }

  /** Per-nation customer proximity edges (lead 1 and 2), shared with
    * the triangle-count oracle's construction.
    */
  private val ProximityEdgeCtes =
    """nb AS (
      |  SELECT c_custkey AS src,
      |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
      |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2
      |  FROM customer),
      |e AS (
      |  SELECT src AS u, d1 AS v FROM nb WHERE d1 IS NOT NULL
      |  UNION
      |  SELECT src AS u, d2 AS v FROM nb WHERE d2 IS NOT NULL)""".stripMargin

  /** DuckDB twin of [[graft.graph.Algorithms.ktrussQuery]]: peeling
    * rounds unrolled — per round the ascending-wedge triangle
    * enumeration, per-edge support via a left join (no-triangle edges
    * keep 0), filter at k−2; final support recomputed on the
    * survivors.
    */
  def ktruss(k: Int = 4, rounds: Int = 2): String = {
    def supportSql(src: String, tri: String, out: String): String =
      s"""$tri AS (
         |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM $src e1 JOIN $src e2 ON e1.v = e2.u
         |  JOIN $src e3 ON e3.u = e1.u AND e3.v = e2.v),
         |$out AS (
         |  SELECT ed.u, ed.v, COALESCE(ts.tsup, CAST(0 AS BIGINT)) AS support
         |  FROM $src ed LEFT JOIN (
         |    SELECT u, v, COUNT(*) AS tsup FROM (
         |      SELECT a AS u, b AS v FROM $tri
         |      UNION ALL SELECT b AS u, c AS v FROM $tri
         |      UNION ALL SELECT a AS u, c AS v FROM $tri) GROUP BY u, v) ts
         |  USING (u, v))""".stripMargin
    val steps = (1 to rounds).map { j =>
      s"""${supportSql(s"e${j - 1}", s"t$j", s"s$j")},
         |e$j AS MATERIALIZED (
         |  SELECT u, v FROM s$j WHERE support >= ${k - 2})""".stripMargin
    }.mkString(",\n")
    s"""WITH nb3 AS (
       |  SELECT c_custkey AS src,
       |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
       |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2,
       |    lead(c_custkey, 3) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d3
       |  FROM customer),
       |e0 AS MATERIALIZED (
       |  SELECT src AS u, d1 AS v FROM nb3 WHERE d1 IS NOT NULL
       |  UNION SELECT src AS u, d2 AS v FROM nb3 WHERE d2 IS NOT NULL
       |  UNION SELECT src AS u, d3 AS v FROM nb3 WHERE d3 IS NOT NULL),
       |$steps,
       |${supportSql(s"e$rounds", "tfin", "sfin")}
       |SELECT u, v, support FROM sfin ORDER BY u, v""".stripMargin
  }

  /** DuckDB twin of [[graft.graph.Algorithms.clusteringCoeffQuery]]:
    * chain edges always point ascending, so each triangle enumerates
    * exactly once as (u, v, w) with u<v<w.
    */
  def clusteringCoeff: String =
    s"""WITH $ProximityEdgeCtes,
       |t AS (
       |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM e e1 JOIN e e2 ON e1.v = e2.u
       |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
       |m AS (SELECT unnest([a, b, c]) AS id FROM t),
       |ntri AS (SELECT id, COUNT(*) AS n_tri FROM m GROUP BY id),
       |deg AS (
       |  SELECT id, COUNT(*) AS degree FROM (
       |    SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e)
       |  GROUP BY id)
       |SELECT d.id, d.degree, COALESCE(n.n_tri, 0) AS n_tri,
       |  CASE WHEN d.degree >= 2
       |    THEN round(2.0 * COALESCE(n.n_tri, 0)
       |      / (d.degree * (d.degree - 1)), 6)
       |    ELSE 0.0 END AS coeff
       |FROM deg d LEFT JOIN ntri n USING (id)
       |ORDER BY id""".stripMargin

  /** DuckDB twin of [[graft.graph.Algorithms.ssspQuery]]: the same
    * lead-(1,2,8) weighted edges and per-nation min-custkey sources,
    * with `rounds` Bellman–Ford relaxations unrolled as CTEs (the
    * Spark loop's early-stop cannot change the fixpoint, so equal
    * round counts give equal results once converged).
    */
  def ssspWeighted(rounds: Int = 14): String = {
    val steps = (1 to rounds).map { j =>
      s"""d$j AS MATERIALIZED (
         |  SELECT id, MIN(cost) AS cost FROM (
         |    SELECT id, cost FROM d${j - 1}
         |    UNION ALL
         |    SELECT we.dst AS id, d.cost + we.w AS cost
         |    FROM d${j - 1} d JOIN we ON d.id = we.src)
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nb AS (
       |  SELECT c_custkey AS src,
       |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
       |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2,
       |    lead(c_custkey, 8) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d8
       |  FROM customer),
       |we AS MATERIALIZED (
       |  SELECT src, dst, 1 + (src + dst) % 7 AS w FROM (
       |    SELECT src, d1 AS dst FROM nb WHERE d1 IS NOT NULL
       |    UNION ALL SELECT src, d2 FROM nb WHERE d2 IS NOT NULL
       |    UNION ALL SELECT src, d8 FROM nb WHERE d8 IS NOT NULL)),
       |d0 AS (
       |  SELECT MIN(c_custkey) AS id, CAST(0 AS BIGINT) AS cost
       |  FROM customer GROUP BY c_nationkey),
       |$steps
       |SELECT c.c_custkey AS id, d.cost
       |FROM customer c LEFT JOIN d$rounds d ON c.c_custkey = d.id
       |ORDER BY id""".stripMargin
  }

  /** DuckDB twin of [[graft.graph.Algorithms.waspQuery]]: the
    * [[ssspWeighted]] relaxation rounds, the tight shortest-path DAG
    * (`dist(u) + w = dist(v)`), and `rounds` unrolled σ sweeps
    * counting minimum-cost paths (Brandes' recurrence over weighted
    * distances; exact integer counts).
    */
  def wasp(rounds: Int = 14): String = {
    val dsteps = (1 to rounds).map { j =>
      s"""d$j AS MATERIALIZED (
         |  SELECT id, MIN(cost) AS cost FROM (
         |    SELECT id, cost FROM d${j - 1}
         |    UNION ALL
         |    SELECT we.dst AS id, d.cost + we.w AS cost
         |    FROM d${j - 1} d JOIN we ON d.id = we.src)
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    val ssteps = (1 to rounds).map { j =>
      s"""s$j AS MATERIALIZED (
         |  SELECT id, CAST(SUM(np) AS BIGINT) AS np FROM (
         |    SELECT id, CAST(1 AS BIGINT) AS np FROM d0
         |    UNION ALL
         |    SELECT t.dst AS id, s.np FROM s${j - 1} s
         |    JOIN tight t ON s.id = t.src)
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nb AS (
       |  SELECT c_custkey AS src,
       |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
       |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2,
       |    lead(c_custkey, 8) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d8
       |  FROM customer),
       |we AS MATERIALIZED (
       |  SELECT src, dst, 1 + (src + dst) % 7 AS w FROM (
       |    SELECT src, d1 AS dst FROM nb WHERE d1 IS NOT NULL
       |    UNION ALL SELECT src, d2 FROM nb WHERE d2 IS NOT NULL
       |    UNION ALL SELECT src, d8 FROM nb WHERE d8 IS NOT NULL)),
       |d0 AS (
       |  SELECT MIN(c_custkey) AS id, CAST(0 AS BIGINT) AS cost
       |  FROM customer GROUP BY c_nationkey),
       |$dsteps,
       |tight AS MATERIALIZED (
       |  SELECT we.src, we.dst
       |  FROM we JOIN d$rounds a ON we.src = a.id
       |  JOIN d$rounds b ON we.dst = b.id
       |  WHERE a.cost + we.w = b.cost),
       |s0 AS (SELECT id, CAST(1 AS BIGINT) AS np FROM d0),
       |$ssteps
       |SELECT c.c_custkey AS id, d.cost, COALESCE(s.np, 0) AS n_paths
       |FROM customer c
       |LEFT JOIN d$rounds d ON c.c_custkey = d.id
       |LEFT JOIN s$rounds s ON c.c_custkey = s.id
       |ORDER BY id""".stripMargin
  }

  /** Token CTEs shared by the sketch oracles: per-token exact counts
    * and the poly-31 base hash (computed once per DISTINCT token).
    * Mirrors [[graft.operators.Sketches.tokenPolysJvm]].
    */
  private val TokenHashCtes =
    s"""w AS (
       |  SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM documents),
       |t AS (SELECT unnest(ws) AS tok FROM w),
       |tg AS (SELECT tok, COUNT(*) AS cnt FROM t WHERE len(tok) > 0
       |       GROUP BY tok),
       |th AS (SELECT tok, cnt, ${polySql("tok")} AS h FROM tg)""".stripMargin

  /** DuckDB twin of [[graft.operators.Sketches.kmvDistinctOn]]. */
  def kmvSketch(k: Int = 256): String = {
    val scale = (k - 1).toDouble * P
    s"""WITH $TokenHashCtes,
       |hp AS (SELECT DISTINCT ${permSql(0, "h")} AS hp FROM th),
       |km AS (SELECT hp FROM hp ORDER BY hp LIMIT $k),
       |sk AS (SELECT MAX(hp) AS kth_hash, COUNT(*) AS n_kept FROM km),
       |tru AS (SELECT COUNT(*) AS true_distinct FROM tg),
       |e AS (
       |  SELECT CAST($k AS BIGINT) AS k, kth_hash, n_kept,
       |    round(CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
       |      ELSE $scale / CAST(kth_hash AS DOUBLE) END, 6) AS est_distinct,
       |    true_distinct
       |  FROM sk, tru)
       |SELECT k, kth_hash, n_kept, est_distinct, true_distinct,
       |  round((est_distinct - true_distinct) / true_distinct, 6) + 0.0
       |    AS rel_err
       |FROM e""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.Sketches.kmvOverlap]]: same
    * permuted hashes, same union-sketch arithmetic, same membership
    * flags.
    */
  def kmvOverlap(k: Int = 256): String = {
    val scale = (k - 1).toDouble * P
    s"""WITH wd AS (
       |  SELECT text,
       |    (CAST(substr(source, 4, 10) AS INT) % 2 = 0) AS grpa
       |  FROM documents),
       |t AS (
       |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok,
       |    grpa
       |  FROM wd),
       |tg AS (SELECT DISTINCT tok, grpa FROM t WHERE len(tok) > 0),
       |hh AS (SELECT ${polySql("tok")} AS h, grpa FROM tg),
       |hp AS (
       |  SELECT ${permSql(0, "h")} AS hp,
       |    MAX(CASE WHEN grpa THEN 1 ELSE 0 END) AS ina,
       |    MAX(CASE WHEN NOT grpa THEN 1 ELSE 0 END) AS inb
       |  FROM hh GROUP BY 1),
       |km AS (SELECT * FROM hp ORDER BY hp LIMIT $k),
       |sk AS (
       |  SELECT MAX(hp) AS kth_hash, COUNT(*) AS n_kept,
       |    CAST(SUM(ina * inb) AS BIGINT) AS n_both
       |  FROM km),
       |tru AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS true_union,
       |    CAST(SUM(ina * inb) AS BIGINT) AS true_intersection
       |  FROM hp),
       |e AS (
       |  SELECT
       |    round(CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
       |      ELSE $scale / CAST(kth_hash AS DOUBLE) END, 6) AS est_union,
       |    round(CAST(n_both AS DOUBLE) / n_kept, 6) AS est_jaccard,
       |    n_kept, n_both, true_union, true_intersection
       |  FROM sk, tru)
       |SELECT CAST($k AS BIGINT) AS k, n_kept, n_both,
       |  est_union + 0.0 AS est_union, est_jaccard + 0.0 AS est_jaccard,
       |  round(est_jaccard * est_union, 6) + 0.0 AS est_intersection,
       |  true_union, true_intersection
       |FROM e""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.Sketches.hllDistinctOn]] —
    * identical register construction (`bit_count((v & -v) - 1)`
    * trailing zeros, cap 24) and the identical left-to-right IEEE
    * evaluation of the alpha_m correction.
    */
  def hllSketch(m: Int = 128): String = {
    s"""WITH $TokenHashCtes,
       |hp AS (SELECT ${permSql(0, "h")} AS hp FROM th),
       |r AS (SELECT hp % $m AS bucket, hp // $m AS v FROM hp),
       |rr AS (SELECT bucket,
       |         least(bit_count((v & (-v)) - 1) + 1, 24) AS rho FROM r),
       |mx AS (SELECT bucket, MAX(rho) AS m_j FROM rr GROUP BY bucket),
       |fl AS (
       |  SELECT g.bucket, COALESCE(mx.m_j, 0) AS m_j
       |  FROM (SELECT range AS bucket FROM range($m)) g
       |  LEFT JOIN mx USING (bucket)),
       |s AS (
       |  SELECT SUM(pow(2.0, -m_j)) AS s,
       |    CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
       |  FROM fl),
       |tru AS (SELECT COUNT(*) AS true_distinct FROM tg),
       |e AS (
       |  SELECT CAST($m AS BIGINT) AS m,
       |    round(0.7213 / (1.0 + 1.079 / $m.0) * $m.0 * $m.0 / s, 6)
       |      AS est_distinct,
       |    n_zero, true_distinct
       |  FROM s, tru)
       |SELECT m, est_distinct, n_zero, true_distinct,
       |  round((est_distinct - true_distinct) / true_distinct, 6) + 0.0
       |    AS rel_err
       |FROM e""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.Sketches.cmsTopkOn]]. */
  def cmsTopk(depth: Int = 4, width: Int = 1024, topk: Int = 20): String = {
    s"""WITH $TokenHashCtes,
       |ix AS (SELECT p AS i, pa, pb FROM ${permTableSql(depth)}),
       |cc AS (
       |  SELECT i, ${permJoinedSql("h")} % $width AS cell,
       |    CAST(SUM(cnt) AS BIGINT) AS ccnt
       |  FROM th CROSS JOIN ix GROUP BY 1, 2),
       |top AS (SELECT tok, h, cnt FROM th ORDER BY cnt DESC, tok LIMIT $topk),
       |tc AS (
       |  SELECT tok, cnt, i, ${permJoinedSql("h")} % $width AS cell
       |  FROM top CROSS JOIN ix)
       |SELECT tc.tok AS token, tc.cnt AS true_cnt, MIN(cc.ccnt) AS est_cnt
       |FROM tc JOIN cc USING (i, cell)
       |GROUP BY 1, 2 ORDER BY true_cnt DESC, token""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.TextAnalysis.qualityModel]] —
    * identical feature hashing (poly-31 → permutation 0 → mod dim)
    * and the identical integer stub weight `((A·(j+7)+B) mod P) mod
    * 201 − 100`. The vocabulary is hashed once and occurrences join
    * back (Σ cnt·wt ≡ the Spark side's per-occurrence sum — exact
    * integers either way).
    */
  def qualityModel(dim: Int = 1024): String =
    s"""WITH ${qualityScoreCtes(dim)}
       |SELECT doc_id, n_tokens, score,
       |  CAST(score >= 0 AS INTEGER) AS keep
       |FROM qd ORDER BY doc_id""".stripMargin

  /** The hashed-BoW scoring CTE chain (dense per-doc frame `qd` with
    * doc_id/n_tokens/score) shared by [[qualityModel]] and
    * [[budgetSelect]].
    */
  private def qualityScoreCtes(dim: Int): String = {
    import OracleHash.{MulA, MulB}
    s"""wd AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM documents),
       |td AS (SELECT doc_id, unnest(ws) AS tok FROM wd),
       |tdg AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM td
       |        WHERE len(tok) > 0 GROUP BY 1, 2),
       |vocab AS (SELECT DISTINCT tok FROM tdg),
       |vh AS (SELECT tok, ${polySql("tok")} AS h FROM vocab),
       |vb AS (SELECT tok, ${permSql(0, "h")} % $dim AS bucket FROM vh),
       |wt AS (SELECT CAST(j AS BIGINT) AS bucket,
       |         (($MulA*(j+7)+$MulB) % $P) % 201 - 100 AS wt
       |       FROM (SELECT unnest(range(0, $dim)) AS j)),
       |s AS (SELECT g.doc_id, CAST(SUM(g.cnt) AS BIGINT) AS n_tokens,
       |        CAST(SUM(g.cnt * wt.wt) AS BIGINT) AS score
       |      FROM tdg g JOIN vb USING (tok) JOIN wt USING (bucket)
       |      GROUP BY 1),
       |qd AS (SELECT d.doc_id,
       |         COALESCE(s.n_tokens, 0) AS n_tokens,
       |         COALESCE(s.score, 0) AS score
       |       FROM documents d LEFT JOIN s USING (doc_id))""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.Pipeline.budgetSelect]]: the
    * shared scoring CTEs, bucket histogram cumulative sums, and the
    * same within-bucket prefix rule.
    */
  def budgetSelect(dim: Int = 1024, budget: Long = 10000L): String =
    s"""WITH ${qualityScoreCtes(dim)},
       |hist AS (SELECT score, SUM(n_tokens) AS bucket_tokens
       |         FROM qd GROUP BY 1),
       |cum AS (
       |  SELECT score, COALESCE(SUM(bucket_tokens) OVER (
       |    ORDER BY score DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS cum_before
       |  FROM hist),
       |r AS (
       |  SELECT qd.doc_id, qd.score, qd.n_tokens, c.cum_before,
       |    SUM(qd.n_tokens) OVER (PARTITION BY qd.score
       |      ORDER BY qd.doc_id ROWS UNBOUNDED PRECEDING) AS run_inc
       |  FROM qd JOIN cum c USING (score))
       |SELECT doc_id, score, n_tokens,
       |  CAST(cum_before + run_inc <= $budget AS INTEGER) AS keep
       |FROM r ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[graft.graph.Algorithms.betweennessQuery]]:
    * σ from a bounded recursive walk enumeration (walks at the
    * minimum depth ARE the shortest paths — no parallel edges in the
    * skip-link DAG), then the backward dependency levels unrolled,
    * each mirroring the engine's round-12 / DECIMAL(38,12) term
    * accumulation exactly.
    */
  def betweenness(maxDepth: Int = 4): String =
    betweennessCtes(maxDepth) + """,
       |bc AS (SELECT v AS id,
       |    round(CAST(SUM(CAST(delta AS DECIMAL(38,12))) AS DOUBLE), 6) + 0.0
       |      AS bc
       |  FROM allv GROUP BY 1)
       |SELECT c_custkey AS id, COALESCE(bc.bc, 0.0) + 0.0 AS bc
       |FROM customer LEFT JOIN bc ON c_custkey = bc.id
       |ORDER BY id""".stripMargin

  /** The shared Brandes CTE chain (skip-link DAG, landmark σ BFS,
    * backward dependency levels) ending at `allv(lm, v, delta)` —
    * one definition behind [[betweenness]] and [[centralityTuning]]
    * so the two cannot drift.
    */
  private def betweennessCtes(maxDepth: Int): String =
    brandesForwardCtes(maxDepth) + brandesBackwardCtes(maxDepth, "")

  /** Forward σ chain only (skip-link DAG, landmark walk enumeration,
    * first-reach σ) ending at `sg(lm, v, dist, sigma)`. First-reach
    * is prefix-stable in the walk bound, so one forward chain at
    * max-depth serves every smaller backward bound — mirrors
    * `Algorithms.brandesForward`.
    */
  private def brandesForwardCtes(maxDepth: Int): String =
    s"""WITH RECURSIVE cw AS (
       |  SELECT c_custkey,
       |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn,
       |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
       |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2,
       |    lead(c_custkey, 8) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d8
       |  FROM customer),
       |e AS MATERIALIZED (
       |  SELECT c_custkey AS src, d1 AS dst FROM cw WHERE d1 IS NOT NULL
       |  UNION ALL SELECT c_custkey, d2 FROM cw WHERE d2 IS NOT NULL
       |  UNION ALL SELECT c_custkey, d8 FROM cw WHERE d8 IS NOT NULL),
       |lmx AS (SELECT c_custkey AS lm FROM cw WHERE rn IN (1, 10)),
       |walk AS (
       |  SELECT lm, lm AS v, 0 AS dd FROM lmx
       |  UNION ALL
       |  SELECT w.lm, e.dst AS v, w.dd + 1 FROM walk w
       |  JOIN e ON e.src = w.v WHERE w.dd < $maxDepth),
       |wc AS (SELECT lm, v, dd, COUNT(*) AS walks FROM walk GROUP BY 1, 2, 3),
       |sg AS MATERIALIZED (
       |  SELECT lm, v, dd AS dist, CAST(walks AS BIGINT) AS sigma FROM (
       |    SELECT lm, v, dd, walks, MIN(dd) OVER (PARTITION BY lm, v) AS md
       |    FROM wc)
       |  WHERE dd = md)""".stripMargin

  /** Backward dependency chain of the depth-`depth`-bounded Brandes
    * over `sg`, CTE names suffixed `sfx` so several bounds coexist in
    * one query; ends at `allv$sfx(lm, v, delta)`.
    */
  private def brandesBackwardCtes(depth: Int, sfx: String): String = {
    val back = new StringBuilder
    var prev = s"dl$sfx$depth"
    for (l <- (depth - 1) to 1 by -1) {
      back ++= s""",
         |c$sfx$l AS (
         |  SELECT s.lm, s.v,
         |    CAST(SUM(CAST(round(CAST(s.sigma AS DOUBLE)/w.sigma
         |      * (1.0 + w.delta), 12) AS DECIMAL(38,12))) AS DOUBLE) AS delta
         |  FROM sg s JOIN e ON e.src = s.v
         |  JOIN $prev w ON w.lm = s.lm AND w.v = e.dst
         |  WHERE s.dist = $l GROUP BY 1, 2),
         |dl$sfx$l AS MATERIALIZED (
         |  SELECT s.lm, s.v, s.sigma, COALESCE(c.delta, 0.0) AS delta
         |  FROM sg s LEFT JOIN c$sfx$l c ON c.lm = s.lm AND c.v = s.v
         |  WHERE s.dist = $l)""".stripMargin
      prev = s"dl$sfx$l"
    }
    val unions = (1 to depth)
      .map(l => s"SELECT lm, v, delta FROM dl$sfx$l")
      .mkString("\n  UNION ALL ")
    s""",
       |dl$sfx$depth AS (SELECT lm, v, sigma, 0.0 AS delta FROM sg
       |  WHERE dist = $depth)$back,
       |allv$sfx AS MATERIALIZED (
       |  $unions)""".stripMargin
  }

  /** DuckDB twin of
    * [[graft.graph.Algorithms.centralityTuningQuery]]: the shared
    * Brandes chain, landmark-prefix re-aggregation per grid k,
    * top-`topN` overlap against the full-set reference.
    */
  def centralityTuning(maxDepth: Int = 4, ks: Seq[Int] = Seq(5, 10, 25, 50),
      topN: Int = 20): String = {
    val kMax = ks.max
    betweennessCtes(maxDepth) + s""",
       |lmr AS (SELECT lm, row_number() OVER (ORDER BY lm) AS r
       |        FROM (SELECT DISTINCT lm FROM allv)),
       |grid AS (SELECT unnest([${ks.mkString(", ")}]) AS k),
       |bck AS MATERIALIZED (
       |  SELECT g.k, a.v AS id,
       |    round(CAST(SUM(CAST(a.delta AS DECIMAL(38,12))) AS DOUBLE), 6)
       |      + 0.0 AS bc,
       |    COUNT(*) AS np
       |  FROM allv a JOIN lmr ON a.lm = lmr.lm CROSS JOIN grid g
       |  WHERE lmr.r <= g.k GROUP BY 1, 2),
       |t AS MATERIALIZED (
       |  SELECT k, id FROM (
       |    SELECT k, id, row_number() OVER (
       |      PARTITION BY k ORDER BY bc DESC, id) AS rnk FROM bck)
       |  WHERE rnk <= $topN),
       |ref AS (SELECT id FROM t WHERE k = $kMax),
       |np AS (SELECT k, CAST(SUM(np) AS BIGINT) AS n_pairs FROM bck GROUP BY 1),
       |ov AS (
       |  SELECT t.k, CAST(COUNT(ref.id) AS BIGINT) AS overlap
       |  FROM t LEFT JOIN ref ON t.id = ref.id GROUP BY 1)
       |SELECT CAST(ov.k AS BIGINT) AS n_landmarks, np.n_pairs,
       |  ov.overlap AS top${topN}_overlap,
       |  round(CAST(ov.overlap AS DOUBLE) / $topN, 6) + 0.0 AS agreement
       |FROM ov JOIN np USING (k) ORDER BY n_landmarks""".stripMargin
  }

  /** DuckDB twin of
    * [[graft.graph.Algorithms.centralityDepthTuningQuery]]: one
    * forward σ chain at max(depths), one suffixed backward chain per
    * grid depth, per-depth bc + top-`topN` overlap against the
    * deepest bound.
    */
  def centralityDepthTuning(depths: Seq[Int] = Seq(2, 3, 4),
      topN: Int = 20): String = {
    val maxD = depths.max
    val backs = depths.map(d => brandesBackwardCtes(d, s"_${d}_")).mkString
    val bcd = depths.map(d =>
      s"""SELECT $d AS dep, v AS id,
         |    round(CAST(SUM(CAST(delta AS DECIMAL(38,12))) AS DOUBLE), 6)
         |      + 0.0 AS bc,
         |    COUNT(*) AS np
         |  FROM allv_${d}_ GROUP BY v""".stripMargin)
      .mkString("\n  UNION ALL ")
    brandesForwardCtes(maxD) + backs + s""",
       |bcd AS MATERIALIZED (
       |  $bcd),
       |t AS MATERIALIZED (
       |  SELECT dep, id FROM (
       |    SELECT dep, id, row_number() OVER (
       |      PARTITION BY dep ORDER BY bc DESC, id) AS rnk FROM bcd)
       |  WHERE rnk <= $topN),
       |ref AS (SELECT id FROM t WHERE dep = $maxD),
       |st AS (SELECT dep, CAST(SUM(np) AS BIGINT) AS n_state
       |       FROM bcd GROUP BY 1),
       |ov AS (
       |  SELECT t.dep, CAST(COUNT(ref.id) AS BIGINT) AS overlap
       |  FROM t LEFT JOIN ref ON t.id = ref.id GROUP BY 1)
       |SELECT CAST(ov.dep AS BIGINT) AS max_depth, st.n_state,
       |  ov.overlap AS top${topN}_overlap,
       |  round(CAST(ov.overlap AS DOUBLE) / $topN, 6) + 0.0 AS agreement
       |FROM ov JOIN st USING (dep) ORDER BY max_depth""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.Similarity.pcaPower]] — the
    * power iterations unrolled as CTEs: identical 6-dp decimal means,
    * identical 12-dp product partials into DECIMAL(38,12), the same
    * in-row `list_dot_product` folds (left-to-right, matching the
    * codegen DotProduct loop), and the same sign-fix-then-round
    * normalize.
    */
  def pcaPower(iters: Int = 5): String = {
    val steps = (1 to iters).map { k =>
      s"""w$k AS (
         |  SELECT d, CAST(SUM(CAST(t AS DECIMAL(38,12))) AS DOUBLE) AS w
         |  FROM (SELECT d, round(cx * s, 12) AS t
         |        FROM (SELECT unnest(c) AS cx,
         |                generate_subscripts(c, 1) - 1 AS d,
         |                list_dot_product(c, pv) AS s
         |              FROM cent CROSS JOIN p${k - 1}))
         |  GROUP BY d),
         |wl$k AS MATERIALIZED (SELECT list(w ORDER BY d) AS wv FROM w$k),
         |n$k AS MATERIALIZED (
         |  SELECT wv, sqrt(list_dot_product(wv, wv)) AS nrm FROM wl$k),
         |p$k AS MATERIALIZED (
         |  SELECT CASE WHEN nrm = 0.0 THEN wv
         |    ELSE list_transform(
         |      CASE WHEN COALESCE(list_filter(wv, x -> x <> 0.0)[1], 0.0) < 0
         |           THEN list_transform(wv, x -> -x) ELSE wv END,
         |      x -> round(x / nrm, 9)) END AS pv
         |  FROM n$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |md AS MATERIALIZED (
       |  SELECT d,
       |    round(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) AS m
       |  FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) - 1 AS d FROM e)
       |  GROUP BY d),
       |mu AS MATERIALIZED (SELECT list(m ORDER BY d) AS mu FROM md),
       |cent AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(range(1, len(v)+1), i -> v[i] - mu[i]) AS c
       |  FROM e CROSS JOIN mu),
       |p0 AS (SELECT list_transform(mu,
       |         x -> 1.0/sqrt(CAST(len(mu) AS DOUBLE))) AS pv FROM mu),
       |$steps,
       |lam AS (SELECT round(nrm / (SELECT COUNT(*) FROM cent), 6) AS lambda
       |        FROM n$iters),
       |tv AS (SELECT CAST(SUM(CAST(round(cx*cx, 12) AS DECIMAL(38,12)))
       |           AS DOUBLE) / (SELECT COUNT(*) FROM cent) AS tv
       |       FROM (SELECT unnest(c) AS cx FROM cent)),
       |ld AS (SELECT unnest(pv) AS loading,
       |         generate_subscripts(pv, 1) - 1 AS d FROM p$iters)
       |SELECT CAST(md.d AS BIGINT) AS d, md.m + 0.0 AS mean,
       |  ld.loading + 0.0 AS loading, lam.lambda,
       |  CASE WHEN tv.tv = 0.0 THEN 0.0
       |       ELSE round(lam.lambda / round(tv.tv, 6), 6) END AS var_share
       |FROM md JOIN ld USING (d) CROSS JOIN lam CROSS JOIN tv
       |ORDER BY d""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.TextAnalysis.bpeTrain]] — the
    * merge rounds unrolled as CTE chains: each round re-derives pair
    * counts from the previous round's representations, takes the same
    * `ORDER BY cnt DESC, pair LIMIT 1` argmax, and applies the same
    * literal sentinel-space `replace` (both engines rewrite
    * non-overlapping occurrences left-to-right).
    */
  def bpeTrain(rounds: Int = 8): String =
    bpeCtes(rounds) + "\n" + (1 to rounds).map(k =>
      s"SELECT CAST($k AS BIGINT) AS round, pair, " +
        s"replace(pair, ' ', '') AS merged, cnt FROM b$k")
      .mkString("", "\nUNION ALL\n", "\nORDER BY round")

  /** The BPE training CTE chain (vocab `wf`, per-round argmax rules
    * in `b1..bN`) shared by [[bpeTrain]] and [[bpeEncode]].
    */
  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents),
       |wf AS (SELECT tok, COUNT(*) AS freq FROM toks
       |       WHERE regexp_matches(tok, '^[a-z]+$$') GROUP BY 1),
       |r0 AS (SELECT ' ' || list_aggregate(
       |    list_transform(range(1, len(tok)+1),
       |      i -> substr(tok, CAST(i AS INT), 1)), 'string_agg', ' ')
       |    || ' ' AS r, freq FROM wf)""".stripMargin
    for (k <- 1 to rounds) {
      val prev = s"r${k - 1}"
      sb ++= s""",
       |s$k AS (SELECT string_split(trim(r), ' ') AS sy, freq FROM $prev),
       |p$k AS (SELECT unnest(list_transform(range(1, len(sy)),
       |          i -> sy[i] || ' ' || sy[i+1])) AS pair, freq FROM s$k),
       |b$k AS MATERIALIZED (SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
       |        FROM p$k GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 1),
       |r$k AS MATERIALIZED (
       |        SELECT replace(r, ' ' || (SELECT pair FROM b$k) || ' ',
       |          ' ' || replace((SELECT pair FROM b$k), ' ', '') || ' ') AS r,
       |          freq FROM $prev)""".stripMargin
    }
    sb.result()
  }

  /** DuckDB twin of [[graft.operators.TextAnalysis.bpeEncode]] —
    * the same trained rules (shared CTEs), applied per document as
    * the same sentinel-space literal replaces in rank order.
    */
  def bpeEncode(rounds: Int = 8): String = {
    val sb = new StringBuilder
    sb ++= bpeCtes(rounds)
    sb ++= s""",
       |docw AS (
       |  SELECT doc_id, list_filter(
       |    regexp_split_to_array(lower(trim(text)), '\\s+'),
       |    w -> regexp_matches(w, '^[a-z]+$$')) AS ws
       |  FROM documents),
       |d0 AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(ws,
       |      w -> ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '),
       |      '') AS r,
       |    CAST(COALESCE(list_aggregate(
       |      list_transform(ws, w -> len(w)), 'sum'), 0) AS BIGINT) AS n_sym0
       |  FROM docw)""".stripMargin
    for (k <- 1 to rounds) {
      sb ++= s""",
       |d$k AS (
       |  SELECT doc_id, n_sym0,
       |    replace(r, ' ' || (SELECT pair FROM b$k) || ' ',
       |      ' ' || replace((SELECT pair FROM b$k), ' ', '') || ' ') AS r
       |  FROM d${k - 1})""".stripMargin
    }
    sb ++= s"""
       |SELECT doc_id, n_sym0,
       |  CASE WHEN trim(r) = '' THEN CAST(0 AS BIGINT)
       |       ELSE CAST(len(regexp_split_to_array(trim(r), ' +')) AS BIGINT)
       |  END AS n_tokens,
       |  CASE WHEN n_sym0 = 0 THEN 0.0
       |       ELSE round(CAST(CASE WHEN trim(r) = '' THEN 0
       |         ELSE len(regexp_split_to_array(trim(r), ' +')) END AS DOUBLE)
       |         / n_sym0, 6) END + 0.0 AS compression,
       |  md5(r) AS repr_md5
       |FROM d$rounds ORDER BY doc_id""".stripMargin
    sb.result()
  }

  /** DuckDB twin of [[graft.operators.Pipeline.importanceSample]] —
    * identical feature hashing (poly-31 → permutation 0 → mod dim,
    * computed once per DISTINCT token and joined back), identical
    * add-1-smoothed 6-dp log-ratios, and the same DECIMAL(28,12)
    * accumulation of the rounded per-occurrence terms.
    */
  def importanceSample(dim: Int = 256, targetLang: String = "en"): String =
    s"""WITH wd AS (
       |  SELECT doc_id, lang,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM documents),
       |td AS (SELECT doc_id, lang, unnest(ws) AS tok FROM wd),
       |t2 AS (SELECT doc_id, lang, tok FROM td WHERE len(tok) > 0),
       |vocab AS (SELECT DISTINCT tok FROM t2),
       |vh AS (SELECT tok, ${polySql("tok")} AS h FROM vocab),
       |vb AS (SELECT tok, ${permSql(0, "h")} % $dim AS bucket FROM vh),
       |occ AS (SELECT doc_id, lang, bucket FROM t2 JOIN vb USING (tok)),
       |rc AS (SELECT bucket, COUNT(*) AS cnt_r FROM occ GROUP BY 1),
       |tc AS (SELECT bucket, COUNT(*) AS cnt_t FROM occ
       |       WHERE lang = '$targetLang' GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS tot_r,
       |          SUM(CASE WHEN lang = '$targetLang' THEN 1 ELSE 0 END) AS tot_t
       |        FROM occ),
       |bl AS (SELECT CAST(j AS BIGINT) AS bucket
       |       FROM (SELECT unnest(range(0, $dim)) AS j)),
       |lr AS (SELECT bucket,
       |    round(ln(CAST(COALESCE(cnt_t, 0) + 1 AS DOUBLE) / (tot_t + $dim))
       |        - ln(CAST(COALESCE(cnt_r, 0) + 1 AS DOUBLE) / (tot_r + $dim)),
       |      6) AS lr
       |  FROM bl LEFT JOIN rc USING (bucket) LEFT JOIN tc USING (bucket)
       |  CROSS JOIN tot),
       |s AS (SELECT doc_id, COUNT(*) AS n_tok,
       |        round(CAST(SUM(CAST(lr AS DECIMAL(28,12))) AS DOUBLE), 6) + 0.0
       |          AS weight
       |      FROM occ JOIN lr USING (bucket) GROUP BY 1)
       |SELECT d.doc_id,
       |  COALESCE(s.n_tok, 0) AS n_tok,
       |  COALESCE(s.weight, 0.0) + 0.0 AS weight,
       |  CAST(COALESCE(s.weight, 0.0) >= 0 AS INTEGER) AS keep
       |FROM documents d LEFT JOIN s USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** The first-order deterministic walk corpus as a recursive CTE
    * (`walk(walker, step, node)`) — shared by [[randomWalk]] and
    * [[walkSkipgrams]]. Mirrors `Algorithms.randomWalkQuery`
    * bit-for-bit: per-src row_number neighbor index, seeded
    * overflow-free modular hash, inner-join dead-end semantics.
    */
  private def randomWalkCtes(steps: Int = 8): String =
    s"""WITH RECURSIVE base AS MATERIALIZED (
       |  SELECT c_custkey AS src,
       |    lead(c_custkey, 1) OVER w AS d1,
       |    lead(c_custkey, 2) OVER w AS d2,
       |    lead(c_custkey, 8) OVER w AS d8
       |  FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)),
       |e AS MATERIALIZED (
       |  SELECT src, d1 AS dst FROM base WHERE d1 IS NOT NULL
       |  UNION ALL SELECT src, d2 FROM base WHERE d2 IS NOT NULL
       |  UNION ALL SELECT src, d8 FROM base WHERE d8 IS NOT NULL),
       |i AS MATERIALIZED (
       |  SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
       |  FROM e),
       |d AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |walk(walker, step, node) AS (
       |  SELECT CAST(c_custkey AS BIGINT), CAST(0 AS BIGINT), CAST(c_custkey AS BIGINT)
       |  FROM customer WHERE c_custkey % 100 = 1
       |  UNION ALL
       |  SELECT w.walker, w.step + 1, CAST(i.dst AS BIGINT)
       |  FROM walk w
       |  JOIN d ON d.src = w.node
       |  JOIN i ON i.src = w.node
       |   AND i.idx = (((w.node % 1000003) * 37 + (w.walker % 1000003)
       |                 + w.step * 101) % 1000003) % d.deg
       |  WHERE w.step < $steps)""".stripMargin

  def randomWalk(steps: Int = 8): String =
    s"""${randomWalkCtes(steps)}
       |SELECT walker, step, node FROM walk ORDER BY walker, step""".stripMargin

  def walkSkipgrams(steps: Int = 8, window: Int = 2): String =
    s"""${randomWalkCtes(steps)}
       |SELECT a.node AS center, b.node AS context,
       |  COUNT(*) AS n_pairs
       |FROM walk a JOIN walk b ON a.walker = b.walker
       | AND a.step <> b.step AND abs(a.step - b.step) <= $window
       |GROUP BY 1, 2 ORDER BY center, context""".stripMargin

  /** node2vec-style second-order biased walk, steps unrolled as CTEs
    * (window functions are off-limits inside a recursive member, so
    * the rounds-as-CTEs discipline applies). Mirrors
    * `Algorithms.biasedWalkQuery` bit-for-bit: symmetrized proximity
    * edges, integer bias weights (return 1 / shared 4 / outward 2),
    * cumulative-weight inversion of the shared seeded hash.
    */
  def biasedWalk(steps: Int = 6): String = {
    val hash = "(((q.node % 1000003) * 37 + (q.walker % 1000003)" +
      " + q.pstep * 101) % 1000003) % q.tot"
    val stepCtes = (1 to steps).map { k =>
      s"""s$k AS MATERIALIZED (
         |  SELECT q.walker, CAST($k AS BIGINT) AS step,
         |    q.node AS prev, q.dst AS node
         |  FROM (
         |    SELECT c.*, SUM(wt) OVER (PARTITION BY walker ORDER BY dst) AS cum,
         |           SUM(wt) OVER (PARTITION BY walker) AS tot
         |    FROM (
         |      SELECT s.walker, s.step AS pstep, s.prev, s.node, e.dst,
         |        CASE WHEN e.dst = s.prev THEN 1
         |             WHEN EXISTS (SELECT 1 FROM e2 x
         |                          WHERE x.src = s.prev AND x.dst = e.dst) THEN 4
         |             ELSE 2 END AS wt
         |      FROM s${k - 1} s JOIN e2 e ON e.src = s.node) c) q
         |  WHERE q.cum - q.wt <= $hash AND $hash < q.cum)""".stripMargin
    }.mkString(",\n")
    val unions = (0 to steps)
      .map(k => s"SELECT walker, step, node FROM s$k").mkString("\n  UNION ALL ")
    s"""WITH base AS (
       |  SELECT c_custkey AS src,
       |    lead(c_custkey, 1) OVER w AS d1,
       |    lead(c_custkey, 2) OVER w AS d2,
       |    lead(c_custkey, 8) OVER w AS d8
       |  FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)),
       |f AS (
       |  SELECT src, d1 AS dst FROM base WHERE d1 IS NOT NULL
       |  UNION ALL SELECT src, d2 FROM base WHERE d2 IS NOT NULL
       |  UNION ALL SELECT src, d8 FROM base WHERE d8 IS NOT NULL),
       |e2 AS MATERIALIZED (
       |  SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM f
       |  UNION ALL
       |  SELECT CAST(dst AS BIGINT), CAST(src AS BIGINT) FROM f),
       |s0 AS MATERIALIZED (
       |  SELECT CAST(c_custkey AS BIGINT) AS walker, CAST(0 AS BIGINT) AS step,
       |    CAST(-1 AS BIGINT) AS prev, CAST(c_custkey AS BIGINT) AS node
       |  FROM customer WHERE c_custkey % 200 = 1),
       |$stepCtes
       |SELECT walker, step, node FROM (
       |  $unions)
       |ORDER BY walker, step""".stripMargin
  }
}
