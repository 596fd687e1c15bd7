package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ann results are a subset of the scored universe with decent recall") {
    val brute = Similarity.topkBruteforce(spark, TestSpark.sf, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.annLsh(spark, TestSpark.sf, k = 10, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.count(ann.contains).toDouble / brute.size
    // single-probe LSH on random-ish embeddings: expect a meaningful
    // overlap, not perfection
    assert(recall >= 0.3, s"ANN recall $recall")
    assert(ann.nonEmpty)
  }

  test("recallEval agrees with a hand-computed ANN/exact overlap") {
    val k = 10
    val brute = Similarity.topkBruteforce(spark, TestSpark.sf, k)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val ann = Similarity.annLsh(spark, TestSpark.sf, k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val expected = brute.groupBy(_._1).view
      .mapValues(_.count(ann.contains).toLong).toMap
    val got = Similarity.recallEval(spark, TestSpark.sf, k).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (q, nHit, rec) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(nHit == expected(q), s"q=$q")
      assert(rec == math.rint(nHit.toDouble / k * 1e6) / 1e6)
    }
  }

  test("int8 quantization saturates exactly at per-dim extremes and bounds codes") {
    val rows = Similarity.quantizeInt8(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("code_min") >= -127)
      assert(r.getAs[Int]("code_max") <= 127)
    }
    // scale = max|x| per dim means each dimension's extreme vector
    // quantizes to ±127 — so saturation must occur somewhere in the
    // corpus (at least one saturated dim overall), but codes never
    // exceed the symmetric budget
    assert(rows.map(_.getAs[Long]("n_sat")).sum >= 1L)
    // reconstruction sanity on one vector: |x − code·s/127| ≤ s/254
    // (half-up rounding's half-step bound) for every dimension
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
      .orderBy("vec_id").head()
    val v = emb.getSeq[Float](1).map(_.toDouble)
    val scales = graft.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("posexplode(embedding) as (d, x)")
      .groupBy("d").agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.col("x").cast("double"))).as("s"))
      .orderBy("d").collect().map(_.getAs[Double]("s"))
    v.zip(scales).foreach { case (x, s) =>
      if (s > 0) {
        val code = math.floor(x * 127.0 / s + 0.5)
        assert(math.abs(x - code * s / 127.0) <= s / 254.0 + 1e-12)
      }
    }
  }

  test("ivf probes recover a meaningful share of the exact top-k") {
    val brute = Similarity.topkBruteforce(spark, TestSpark.sf, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.annIvf(spark, TestSpark.sf, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    // 2 of ~10 cells probed; labels correlate with geometry only
    // loosely on synthetic data, so expect overlap, not perfection
    assert(recall >= 0.2, s"IVF recall $recall")
    assert(ivf.nonEmpty)
  }

  test("ivfpq: exact-reranked shortlist tracks the plain-IVF retrieval") {
    // IVFPQ searches the same probed cells as annIvf but pre-filters
    // with the compressed ADC before the exact re-rank, so with a
    // shortlist much larger than k it should recover most of what the
    // uncompressed in-cell ranking finds
    val ivf = Similarity.annIvf(spark, TestSpark.sf, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = Similarity.annIvfPq(spark, TestSpark.sf, k = 10, nprobe = 2)
      .collect()
    val pqSet = ivfpq.map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = ivf.count(pqSet.contains).toDouble / ivf.size
    assert(overlap >= 0.6, s"IVFPQ/IVF overlap $overlap")
    // dense ranks, descending exact scores per query
    ivfpq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse, "exact re-rank must order scores")
    }
    // deterministic: a second run is bit-identical
    val again = Similarity.annIvfPq(spark, TestSpark.sf, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq ==
      ivfpq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq)
  }

  test("LSH-blocked near-dup pairs recall >= 0.85 of exact all-pairs truth") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    // exact all-pairs ground truth (test scale only)
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = emb.select(col("vec_id").as("a_id"), col("v").as("a_v"), col("nrm").as("a_nrm"))
    val b = emb.select(col("vec_id").as("b_id"), col("v").as("b_v"), col("nrm").as("b_nrm"))
    val truth = a.join(b, col("a_id") < col("b_id"))
      .withColumn("cosine", round(
        when(col("a_nrm") === 0.0 || col("b_nrm") === 0.0, 0.0)
          .otherwise(dot(col("a_v"), col("b_v")) / (col("a_nrm") * col("b_nrm"))), 6))
      .filter(col("cosine") >= 0.35)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.embCosineDup(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(truth), "LSH blocking must not invent pairs")
    val recall = truth.count(lsh.contains).toDouble / math.max(truth.size, 1)
    assert(recall >= 0.85, s"near-dup recall $recall over ${truth.size} true pairs")
  }

  test("probe masks enumerate exactly the Hamming ball") {
    assert(Similarity.probeMasks(4, 2).toSet ==
      Set(0L, 1, 2, 4, 8, 3, 5, 9, 6, 10, 12))
    assert(Similarity.probeMasks(4, 0) == Seq(0L))
  }

  test("planesFor tracks corpus size: smallest k in [4,16] with 32*2^k >= n") {
    assert(Similarity.planesFor(1L) == 4)
    assert(Similarity.planesFor(500L) == 4)   // sf0.001/sf0.01 corpora
    assert(Similarity.planesFor(512L) == 4)
    assert(Similarity.planesFor(513L) == 5)
    assert(Similarity.planesFor(2000L) == 6)  // sf0.1 corpus
    assert(Similarity.planesFor(65536L) == 11)
    assert(Similarity.planesFor(32L << 16) == 16)
    assert(Similarity.planesFor(Long.MaxValue / 4) == 16) // clamp
  }

  test("derived planes keep LSH candidate volume <= 10% of all pairs at 64k vectors") {
    // Pure-Scala twin of the embCosineDup blocking: bucket a 64k-vector
    // corpus with the derived plane count, then count candidate pairs
    // exactly from the bucket histogram (sum over buckets x probe
    // masks) — no N^2 join needed. With planesFor(65536) = 11 planes
    // and radius 2, probe coverage is 67/2048 of bucket space, so the
    // fraction must land well under the 10% pin (it is ~3% uniform).
    val n = 65536
    val dims = 64
    val nPlanes = Similarity.planesFor(n.toLong)
    val rnd = new java.util.Random(42)
    val planes = Array.tabulate(nPlanes, dims)((p, d) => Similarity.planeComponent(p, d))
    val hist = new scala.collection.mutable.HashMap[Long, Long]()
    var i = 0
    while (i < n) {
      val v = Array.fill(dims)(rnd.nextGaussian())
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var dot = 0.0
        var d = 0
        while (d < dims) { dot += v(d) * planes(p)(d); d += 1 }
        if (dot >= 0.0) bucket |= (1L << p)
        p += 1
      }
      hist.update(bucket, hist.getOrElse(bucket, 0L) + 1L)
      i += 1
    }
    // each unordered candidate pair matches on exactly one xor mask,
    // counted twice in the ordered sum below (minus n self-pairs at m=0)
    val masks = Similarity.probeMasks(nPlanes, 2)
    var ordered = 0L
    for ((b, c) <- hist; m <- masks)
      ordered += c * hist.getOrElse(b ^ m, 0L)
    val candidates = (ordered - n) / 2
    val allPairs = n.toLong * (n - 1) / 2
    val fraction = candidates.toDouble / allPairs
    assert(fraction <= 0.10, s"candidate fraction $fraction over $allPairs pairs")
  }

  test("label centroids have one row per (label, dim) and bounded values") {
    val rows = Similarity.labelCentroids(spark, TestSpark.sf).collect()
    val dims = rows.map(_.getLong(1)).distinct
    assert(dims.length == 64 && rows.length % 64 == 0)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0001))
  }

  test("brute-force ranks are dense per query") {
    val rows = Similarity.topkBruteforce(spark, TestSpark.sf, k = 10).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length))
    }
    // scores are within [-1, 1] and non-increasing by rank
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
      assert(byRank.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("kmeans matches an in-JVM Lloyd replay exactly") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val k = 8
    val iters = 4
    val rows = graft.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def dotJ(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def d2(v: Array[Double], c: Array[Double]): Double =
      dotJ(v, v) - 2.0 * dotJ(v, c) + dotJ(c, c)
    def r6(x: Double): Double = BigDecimal(x).setScale(6, HALF_UP).toDouble
    // cents sorted by cell id; strict < in the argmin keeps the
    // smallest cell among exact ties, mirroring array_position-of-min
    var cents: Array[(Int, Array[Double])] =
      rows.filter(_._1 < k).map { case (id, v) => (id.toInt, v) }.sortBy(_._1)
    def assign(): Array[(Long, Int, Double)] = rows.map { case (id, v) =>
      val ds = cents.map(c => d2(v, c._2))
      var best = 0; var i = 1
      while (i < ds.length) { if (ds(i) < ds(best)) best = i; i += 1 }
      (id, cents(best)._1, ds(best))
    }
    val byId = rows.toMap
    for (_ <- 1 until iters) {
      val members = assign().groupBy(_._2)
      cents = cents.map { case (cell, old) =>
        members.get(cell) match {
          case None => (cell, old)
          case Some(ms) =>
            val vs = ms.map(m => byId(m._1))
            val dims = vs.head.length
            // decimal(28,12)-accumulated mean, 6-dp rounded — the
            // operator's exact update arithmetic
            val mean = Array.tabulate(dims) { d =>
              val s = vs.map(v => BigDecimal(v(d)).setScale(12, HALF_UP)).sum
              r6(s.toDouble / vs.length)
            }
            (cell, mean)
        }
      }
    }
    val expect = assign().map { case (id, cell, dd) => (id, cell, r6(dd)) }.toSet
    val got = Similarity.kmeans(spark, TestSpark.sf, k, iters)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == expect, s"symmetric diff: ${(got diff expect) ++ (expect diff got)}")
    // sanity: clustering is non-trivial (more than one populated cell)
    assert(got.map(_._2).size > 1)
  }

  test("pca power iteration: unit loading, positive sign fix, sane variance share") {
    val rows = Similarity.pcaPower(spark, TestSpark.sf, iters = 3).collect()
    assert(rows.nonEmpty)
    val loadings = rows.sortBy(_.getLong(0)).map(_.getAs[Double]("loading"))
    // unit norm (9-dp rounding leaves ~1e-8 slack per component)
    val nrm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-6, s"loading norm $nrm")
    // deterministic sign: first nonzero component is positive
    assert(loadings.find(_ != 0.0).forall(_ > 0))
    // the top PC explains a positive share, never more than all of it
    val share = rows.head.getAs[Double]("var_share")
    assert(share > 0.0 && share <= 1.0 + 1e-6, s"var_share $share")
    assert(rows.map(_.getAs[Double]("var_share")).distinct.length == 1)
    // rerun-stable
    val again = Similarity.pcaPower(spark, TestSpark.sf, iters = 3).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("semantic dedup: greedy keep-lowest-id rule is locally consistent") {
    val rows = Similarity.semanticDedup(spark, TestSpark.sf).collect()
    assert(rows.length ==
      graft.Tables.embeddings(spark, TestSpark.sf).count())
    val byId = rows.map(r => r.getAs[Long]("vec_id") -> r).toMap
    var dropped = 0
    rows.foreach { r =>
      val keep = r.getAs[Boolean]("keep")
      if (!keep) {
        dropped += 1
        val dupOf = r.getAs[Long]("dup_of")
        // the attributed representative is a LOWER id in the SAME cluster
        assert(dupOf < r.getAs[Long]("vec_id"))
        assert(byId(dupOf).getAs[Int]("cell") == r.getAs[Int]("cell"))
      } else assert(r.isNullAt(r.fieldIndex("dup_of")))
    }
    // the synthetic corpus has planted near-dups: some must be caught
    assert(dropped > 0 && dropped < rows.length)
  }

  test("pq: m codes per vector, codes in range, errors nonneg, rerun-stable") {
    val m = 4; val k = 8
    val rows = Similarity.pq(spark, TestSpark.sf, m = m, k = k).collect()
    val n = rows.map(_.getAs[Long]("vec_id")).distinct.length
    assert(rows.length == n * m)
    assert(rows.forall { r =>
      val code = r.getAs[Long]("code")
      code >= 0 && code < k && r.getAs[Double]("dist2") >= 0.0
    })
    // every vector carries exactly subspaces 0..m-1
    val bySub = rows.groupBy(_.getAs[Long]("vec_id"))
    assert(bySub.values.forall(
      _.map(_.getAs[Long]("sub")).sorted.toSeq == (0L until m.toLong)))
    val again = Similarity.pq(spark, TestSpark.sf, m = m, k = k).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("cosine histogram: buckets in [-1,1] range, pair mass = N-1") {
    val rows = Similarity.cosHist(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= -10L && b <= 10L
    })
    val n = graft.Tables.embeddings(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == n - 1)
  }

  test("dim-truncation recall: bounded, monotone toward full dims") {
    val quarter = Similarity.dimRecall(spark, TestSpark.sf, keepDims = 16)
      .collect()
    assert(quarter.length > 0)
    assert(quarter.forall { r =>
      val n = r.getAs[Long]("n_hit")
      n >= 0L && n <= 10L &&
        math.abs(r.getAs[Double]("recall_at_k") - n / 10.0) < 1e-9
    })
    // truncating to the FULL dimension count is exact: recall = 1
    val full = Similarity.dimRecall(spark, TestSpark.sf, keepDims = 64)
      .collect()
    assert(full.forall(_.getAs[Double]("recall_at_k") == 1.0))
    // mean recall cannot drop when keeping more dimensions... is not
    // guaranteed per query, but the full-dim ceiling always dominates
    val meanQ = quarter.map(_.getAs[Double]("recall_at_k")).sum / quarter.length
    assert(meanQ <= 1.0)
  }

  test("binary-sign recall: bounded, beats chance, agrees on the diagonal") {
    val rows = Similarity.binaryRecall(spark, TestSpark.sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_hit")
      assert(n >= 0L && n <= 10L)
      assert(math.abs(r.getAs[Double]("recall_at_k") - n / 10.0) < 1e-9)
      assert(r.getAs[Long]("n_dims") == 64L)
    }
    // sign-bit ranking must carry real signal: random ranking on an
    // N-vector corpus recalls ~k/N (≈ 0.2% here) — require the mean
    // to beat that by an order of magnitude
    val corpus = graft.Tables.embeddings(spark, TestSpark.sf).count() - 5
    val chance = 10.0 / corpus
    val mean = rows.map(_.getAs[Double]("recall_at_k")).sum / rows.length
    assert(mean > 10 * chance, s"mean=$mean chance=$chance")
    // determinism
    val again = Similarity.binaryRecall(spark, TestSpark.sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("hamming top-k: packed-word plan equals a per-bit JVM reference") {
    val got = Similarity.hammingTopk(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // independent reference: sign bits compared one by one, no packing
    val vecs = graft.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "cast(embedding as array<double>)")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).map(_ >= 0.0))
      .toMap
    val queries = vecs.keys.filter(_ < 5)
    val want = queries.toSeq.sorted.flatMap { q =>
      vecs.toSeq.collect { case (id, bits) if id >= 5 =>
        (id, bits.zip(vecs(q)).count { case (a, b) => a != b }.toLong)
      }.sortBy { case (id, h) => (h, id) }.take(10).zipWithIndex
        .map { case ((id, h), i) => (q, i + 1L, id, h) }
    }
    assert(got.toSeq == want)
  }

  test("hamming top-k at dims=128: multi-word packing equals the per-bit reference") {
    // the packing must generalize past the R10 two-word/64-dim cap:
    // 128 dims → 4 packed words, scored by the same zip_with
    // XOR+popcount fold, bit-identical to an unpacked per-bit count
    import spark.implicits._
    def comp(id: Long, d: Int): Double =
      (graft.OracleHash.poly(s"$id:$d", 0L) % 1001L).toDouble - 500.0
    val dims = 128
    val n = 60
    val emb = (0L until n).map(id =>
        (id, (0 until dims).map(d => comp(id, d)).toArray))
      .toDF("vec_id", "embedding")
    val codes = Similarity.signCodesOn(emb)
    assert(codes.selectExpr("size(words)").collect()
      .forall(_.getInt(0) == dims / 32), "128 dims must pack to 4 words")
    val got = Similarity.hammingTopkOn(codes, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val bits = (0L until n)
      .map(id => id -> (0 until dims).map(d => comp(id, d) >= 0.0)).toMap
    val want = (0L until 5L).flatMap { q =>
      bits.toSeq.collect { case (id, bs) if id >= 5 =>
        (id, bs.zip(bits(q)).count { case (a, b) => a != b }.toLong)
      }.sortBy { case (id, h) => (h, id) }.take(10).zipWithIndex
        .map { case ((id, h), i) => (q, i + 1L, id, h) }
    }
    assert(got.toSeq == want)
    // a dims=80 corpus (non-multiple of 32) zero-fills the short tail
    val odd = (0L until 20L).map(id =>
        (id, (0 until 80).map(d => comp(id, d)).toArray))
      .toDF("vec_id", "embedding")
    val oddCodes = Similarity.signCodesOn(odd)
    assert(oddCodes.selectExpr("size(words)").collect()
      .forall(_.getInt(0) == 3), "80 dims must pack to 3 words")
    val oddGot = Similarity.hammingTopkOn(oddCodes, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val oddBits = (0L until 20L)
      .map(id => id -> (0 until 80).map(d => comp(id, d) >= 0.0)).toMap
    val oddWant = (0L until 5L).flatMap { q =>
      oddBits.toSeq.collect { case (id, bs) if id >= 5 =>
        (id, bs.zip(oddBits(q)).count { case (a, b) => a != b }.toLong)
      }.sortBy { case (id, h) => (h, id) }.take(5).zipWithIndex
        .map { case ((id, h), i) => (q, i + 1L, id, h) }
    }
    assert(oddGot.toSeq == oddWant)
  }

  test("hamming tuning curve: wider radii never lose candidates or recall") {
    val rows = Similarity.hammingTuning(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8L, 12L, 16L, 20L, 24L))
    rows.foreach { case (_, cand, hits, recall) =>
      assert(hits <= cand && hits <= 50L)
      assert(math.abs(recall - hits / 50.0) < 1e-9)
    }
    // the curve is monotone by construction (radius r admits a
    // superset of radius r-1's candidates) — pin it
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"candidates shrank: $a -> $b")
      assert(b._3 >= a._3, s"hits shrank: $a -> $b")
    }
    // the widest radius (64 bits, r=24) must recover real recall on
    // this corpus and the full-corpus ceiling bounds candidates
    val n = graft.Tables.embeddings(spark, TestSpark.sf).count() - 5
    assert(rows.last._2 <= 5 * n)
    assert(rows.last._3 > 0L, "r=24 found no exact neighbors at all")
  }

  test("embedding contamination: flags only non-benchmark vectors above tau") {
    val benchMod = 29L; val tau = 0.35
    val rows = Similarity.contaminationEmbedding(
      spark, TestSpark.sf, benchMod, tau).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.getAs[Long]("vec_id") % benchMod != 0 &&
        r.getAs[Double]("max_cos") >= tau &&
        r.getAs[Long]("n_hits") >= 1L &&
        r.getAs[Long]("bench_id") % benchMod == 0
    })
  }

  test("tuning curves: probing more is monotone in recall and candidates") {
    // hyperplane sweep: within a plane count, raising the Hamming
    // probe radius can only widen the candidate set (superset probes)
    // and therefore never lowers measured recall
    val ann = Similarity.annTuning(spark, TestSpark.sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
      .toMap
    for (p <- Seq(6L, 10L, 14L); h <- Seq(0L, 1L)) {
      val (rec0, cand0) = ann((p, h))
      val (rec1, cand1) = ann((p, h + 1))
      assert(cand1 >= cand0, s"planes=$p: candidates shrank raising radius")
      assert(rec1 >= rec0 - 1e-9, s"planes=$p: recall dropped raising radius")
    }
    // IVF sweep: same superset argument over probed cells
    val ivf = Similarity.ivfTuning(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    for (Seq(a, b) <- Seq(1L, 2L, 4L).sliding(2)) {
      assert(ivf(b)._2 >= ivf(a)._2, s"nprobe $b candidates < nprobe $a")
      assert(ivf(b)._1 >= ivf(a)._1 - 1e-9, s"nprobe $b recall < nprobe $a")
    }
  }
}
