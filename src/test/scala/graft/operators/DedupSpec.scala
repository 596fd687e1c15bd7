package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exact dedup partitions the corpus") {
    val df = Dedup.exact(spark, TestSpark.sf)
    val total = df.agg(sum("n_dups")).first().getLong(0)
    assert(total == graft.Tables.documents(spark, TestSpark.sf).count())
    // canonical ids are distinct
    assert(df.select("keep_doc_id").distinct().count() == df.count())
  }

  test("minhash LSH estimates track exact jaccard (recall on high-sim pairs)") {
    val exact = Dedup.ngramJaccard(spark, TestSpark.sf, tau = 0.6)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, TestSpark.sf, tau = 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(exact.nonEmpty, "testdata contains near-dup documents")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("simhash near-dup pairs all verify true hamming distance") {
    val sigs = Dedup.simhashSignatures(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.simhashNearDup(spark, TestSpark.sf, maxHamming = 3).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val h = java.lang.Long.bitCount(sigs(r.getLong(0)) ^ sigs(r.getLong(1)))
      assert(h == r.getLong(2) && h <= 3)
    }
    // pigeonhole blocking is exhaustive for hamming<=3: brute-force check
    val ids = sigs.keys.toSeq.sorted
    val brute = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      if java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j))) <= 3
    } yield (ids(i), ids(j))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == brute.toSet)
    // and the blocking adapts to other distances (k+1 blocks), staying
    // exhaustive rather than silently losing completeness
    val pairs6 = Dedup.simhashNearDup(spark, TestSpark.sf, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute6 = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      if java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j))) <= 6
    } yield (ids(i), ids(j))).toSet
    assert(pairs6 == brute6)
    // maxHamming = 7 → 8 blocks of width 8: the top block's rem-shift
    // reaches (blk+1)*width = 64, where an unguarded shiftright masks
    // the amount mod 64 (r17 ADVICE) — the guarded expression must
    // stay exhaustive
    val pairs7 = Dedup.simhashNearDup(spark, TestSpark.sf, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute7 = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      if java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j))) <= 7
    } yield (ids(i), ids(j))).toSet
    assert(pairs7 == brute7)
  }

  test("dedup clusters: labels are cluster minima and respect pair edges") {
    val clusters = Dedup.dedupClusters(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every document is labeled, label is a member of its own cluster
    assert(clusters.size == graft.Tables.documents(spark, TestSpark.sf).count())
    clusters.foreach { case (id, c) => assert(c <= id && clusters(c) == c) }
    // near-dup pairs land in the same cluster
    Dedup.ngramJaccard(spark, TestSpark.sf).collect().foreach { r =>
      assert(clusters(r.getLong(0)) == clusters(r.getLong(1)))
    }
  }

  test("bloom-prefiltered incremental dedup is byte-identical to the plain one") {
    val plain = Dedup.incrementalDedup(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val bloom = Dedup.bloomIncremental(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // no false negatives: every true band collision survives the
    // prefilter; the band join removes false positives => identical
    assert(bloom == plain)
    assert(bloom.nonEmpty)
  }

  test("shingles slide a 3-word window") {
    import spark.implicits._
    val df = Seq("a b c d", "x y", "").toDF("text")
      .select(Dedup.shingles(col("text")).as("s"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b c", "b c d"), Nil, Nil))
  }

  test("cluster stats conserve document mass") {
    val stats = Dedup.clusterStats(spark, TestSpark.sf).collect()
    val nDocs = graft.Tables.documents(spark, TestSpark.sf).count()
    assert(stats.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(stats.forall(r => r.getAs[Long]("n_docs") ==
      r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")))
    // a real corpus is mostly singletons
    val singles = stats.find(_.getAs[Long]("cluster_size") == 1L)
    assert(singles.exists(_.getAs[Long]("n_clusters") > nDocs / 2))
  }

  test("paragraph dedup: kept mass = distinct segments, clean docs intact") {
    import org.apache.spark.sql.functions.{col, expr}
    val rows = Dedup.paragraphDedup(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("n_dup") <= r.getAs[Long]("n_segs")))
    // conservation: kept segments across the corpus = globally
    // distinct segment strings (first occurrence wins, everything
    // else drops exactly once)
    val kept = rows.map(r =>
      r.getAs[Long]("n_segs") - r.getAs[Long]("n_dup")).sum
    val distinctSegs = graft.Tables.documents(spark, TestSpark.sf)
      .withColumn("ws", expr("split(text, ' ')"))
      .withColumn("nseg", expr("greatest((size(ws) + 9) div 10, 1L)"))
      .select(expr("explode(transform(sequence(0L, nseg - 1), " +
        "i -> array_join(slice(ws, CAST(i * 10 + 1 AS INT), 10), ' ')))")
        .as("seg"))
      .distinct().count()
    assert(kept == distinctSegs, s"kept=$kept distinct=$distinctSegs")
    // a doc with no duplicated segment reassembles to its original
    // text byte-for-byte (windowed split + single-space rejoin is
    // lossless on space-tokenized text)
    val origMd5 = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), org.apache.spark.sql.functions.md5(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cleanDocs = rows.filter(_.getAs[Long]("n_dup") == 0L)
    assert(cleanDocs.nonEmpty)
    assert(cleanDocs.forall(r =>
      r.getAs[String]("clean_md5") == origMd5(r.getAs[Long]("doc_id"))))
    // and some cross-document duplication exists in the corpus
    assert(rows.map(_.getAs[Long]("n_dup")).sum > 0L)
  }

  test("CDC dedup: insertion-robust where fixed windows are blind; reconstruction exact") {
    import spark.implicits._
    // doc 2 = doc 1 with TWO WORDS INSERTED AT THE FRONT. Fixed-window
    // segmentation shifts every later segment, so the paragraph pass
    // sees (almost) nothing duplicated; CDC boundaries re-derive from
    // local content and re-synchronize right after the insertion, so
    // most of doc 2's chunks are exact repeats of doc 1's.
    val base = (1 to 40).map(i =>
      s"sentence number $i about rivers mills and stones").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    Seq((1L, base), (2L, "breaking news " + base),
        (3L, "a completely different document about astronomy and tides"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cdc = Dedup.cdcDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val para = Dedup.paragraphDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // CDC: the shifted copy is still MOSTLY duplicate chunks
    val (cdcChunks, cdcDup, _) = cdc(2L)
    assert(cdcDup.toDouble / cdcChunks > 0.7,
      s"CDC should drop most of the shifted copy, dropped $cdcDup/$cdcChunks")
    // fixed windows: the same copy looks (almost entirely) novel
    val (paraSegs, paraDup) = para(2L)
    assert(paraDup.toDouble / paraSegs < 0.2,
      s"fixed windows unexpectedly caught the shift: $paraDup/$paraSegs")
    // clean docs reconstruct byte-for-byte (no-separator rejoin)
    val origMd5 = Seq((1L, base),
      (3L, "a completely different document about astronomy and tides"))
      .map { case (id, t) => id -> Dedup.md5Hex(t) }.toMap
    assert(cdc(1L)._2 == 0L && cdc(1L)._3 == origMd5(1L))
    assert(cdc(3L)._2 == 0L && cdc(3L)._3 == origMd5(3L))
    // chunk concatenation is lossless: total chunk chars = text chars
    val chunks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) =>
        val cs = Dedup.cdcChunksJvm(t)
        assert(cs.mkString("") == t)
        id -> cs.length
      }.toMap
    assert(chunks(1L) == cdc(1L)._1.toInt)
  }

  test("LSH tuning curve: monotone S-curve, measured counts consistent") {
    val rows = Dedup.lshTuningCurve(spark, TestSpark.sf).collect()
    assert(rows.length == 9)
    val ps = rows.sortBy(_.getAs[Double]("j")).map(_.getAs[Double]("p_candidate"))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "curve must rise")
    // measured: verified pairs never exceed candidates, and the
    // verified count equals the declared minhash query's output
    val (mc, mp) = (rows.head.getAs[Long]("measured_candidates"),
      rows.head.getAs[Long]("measured_pairs"))
    assert(mp <= mc)
    assert(mp == Dedup.minhashLsh(spark, TestSpark.sf).count())
  }

  test("source rates: doc mass conserved, canonical mass = cluster count") {
    val rows = Dedup.sourceRates(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (n, c) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_canonical"))
      c >= 1L && c <= n && r.getAs[Double]("dup_rate") >= 0.0 &&
        r.getAs[Double]("dup_rate") <= 1.0
    })
    val totalDocs = graft.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    // total canonical docs = number of clusters
    val clusters = Dedup.clusterArtifact(spark, TestSpark.sf)
      .select("cluster").distinct().count()
    assert(rows.map(_.getAs[Long]("n_canonical")).sum == clusters)
  }

  test("hot-bucket guard: star edges on duplicate clusters keep clusters, collapse volume") {
    // a corpus WITH a large duplicate cluster — the 10⁵-boilerplate
    // shape, shrunk: 200 identical copies + a near-dup pair + distinct
    // filler. The guarded run must (a) emit LINEAR candidate volume on
    // the cluster, (b) recover the SAME connected components as the
    // exact all-pairs run, (c) keep the cold-bucket pairs bit-identical.
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the miller grinds wheat by the river mill every single day"
    val copies = (0 until 200).map(i => (i.toLong, base))
    val nearA = (500L, base + " extra tail words here")
    val nearB = (501L, base + " extra tail words there")
    val distinct = (600 until 620).map(i => (i.toLong,
      s"totally unrelated document number $i about topic $i with unique " +
        s"content token$i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hotbucket").toString
    (copies ++ Seq(nearA, nearB) ++ distinct).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def comps(pairs: Set[(Long, Long)]): Set[Set[Long]] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      parent.keys.groupBy(find).values.map(_.toSet).toSet
    }
    val guarded = Dedup.minhashLsh(spark, dir, tau = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.minhashLsh(spark, dir, tau = 0.6,
      bucketCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // volume collapse: the 200-cluster contributes 199 star edges, not
    // 19,900 all-pairs
    assert(guarded.count { case (a, b) => a < 200 && b < 200 } == 199)
    assert(exact.count { case (a, b) => a < 200 && b < 200 } == 19900)
    // cluster equivalence
    assert(comps(guarded) == comps(exact))
    // cold pairs (the near-dup pair lives in small buckets) identical
    assert(guarded.contains((500L, 501L)) == exact.contains((500L, 501L)))

    // simhash takes the same guard: identical docs share the simhash,
    // so the 200-cluster is one hot block bucket per block index
    val gSim = Dedup.simhashNearDup(spark, dir, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val eSim = Dedup.simhashNearDup(spark, dir, maxHamming = 3,
      bucketCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gSim.count { case (a, b) => a < 200 && b < 200 } == 199)
    assert(eSim.count { case (a, b) => a < 200 && b < 200 } == 19900)
    assert(comps(gSim) == comps(eSim))
  }

  test("source overlap matrix counts spanning clusters per source pair") {
    val rows = Dedup.sourceOverlapMatrix(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
    assert(rows.forall(r => r.getAs[Long]("n_shared_clusters") >= 1 &&
      r.getAs[Long]("n_docs_involved") >= 2 * r.getAs[Long]("n_shared_clusters")))
    // cross-check pair counts against a direct recomputation from the
    // cluster artifact (every cluster spanning both sources counts once)
    val art = Dedup.clusterArtifact(spark, TestSpark.sf)
      .join(graft.Tables.documents(spark, TestSpark.sf)
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .select("cluster", "source").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expectPairs = art.groupBy(_._1).values
      .flatMap(g => g.map(_._2).toSeq.sorted.distinct.combinations(2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = rows.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Long]("n_shared_clusters")).toMap
    assert(got == expectPairs)
  }

  test("ingestion hot-bucket guard: incremental/bloom outputs unchanged, index collapsed") {
    // the routine re-crawl shape the r16 guard missed: one boilerplate
    // cluster present on BOTH sides of the asymmetric join — 200
    // identical copies split 180 index / 20 delta by the % 10 rule.
    // The guarded run must (a) keep the OUTPUT byte-identical (the
    // best-match rank's index_id tie-break already picks the
    // bucket-min representative the star discipline keeps), and
    // (b) collapse the index side of each hot bucket to one row.
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the miller grinds wheat by the river mill every single day"
    val copies = (0 until 200).map(i => (i.toLong, base))
    val distinctDocs = (600 until 640).map(i => (i.toLong,
      s"totally unrelated document number $i about topic $i with unique " +
        s"content token$i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hotingest").toString
    (copies ++ distinctDocs).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList

    val guarded = rows(Dedup.incrementalDedup(spark, dir))
    val exact = rows(Dedup.incrementalDedup(spark, dir, bucketCap = Int.MaxValue))
    assert(guarded == exact)
    assert(guarded.nonEmpty)
    // every delta copy of the cluster resolves to the representative
    // (the smallest index doc id in the cluster = 1)
    val clusterMatches = guarded.filter(_._1 < 200)
    assert(clusterMatches.size == 20 && clusterMatches.forall(_._2 == 1L))

    // the Bloom twin stays byte-identical to the plain incremental
    // (no false negatives + the same collapsed join)
    assert(rows(Dedup.bloomIncremental(spark, dir)) == exact)
    assert(rows(Dedup.bloomIncremental(spark, dir,
      bucketCap = Int.MaxValue)) == exact)

    // candidate-volume collapse: each of the cluster's 32 hot band
    // buckets keeps 1 representative index row instead of 180
    val sigs = Dedup.minhashSignatures(spark, dir)
    val idxBanded = sigs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band", "band_hash")))
    assert(idxBanded.filter(col("doc_id") < 200).count() == 180L * 32)
    assert(Dedup.guardedIndexBands(idxBanded)
      .filter(col("doc_id") < 200).count() == 32L)
  }

  test("guard telemetry counts the crafted hot corpus exactly") {
    // 200 identical copies -> every one of the 32 band buckets of the
    // cluster holds 200 members; 40 distinct docs add singleton
    // buckets. At any cap < 200 the telemetry must count exactly the
    // 32 hot buckets and 32 * (200 - 1) collapsed rows; at the
    // production HotBucketCap the same (200 > 64).
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the miller grinds wheat by the river mill every single day"
    val copies = (0 until 200).map(i => (i.toLong, base))
    val distinctDocs = (600 until 640).map(i => (i.toLong,
      s"totally unrelated document number $i about topic $i with unique " +
        s"content token$i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_guardtel").toString
    (copies ++ distinctDocs).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sigs = Dedup.minhashSignatures(spark, dir)
    val banded = sigs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "band_hash")))
    val stats = Dedup.guardStatsFromBanded(
      banded, Seq(Dedup.HotBucketCap, 300)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nBuckets, nHot, nCollapsed, maxBucket) =
      stats(Dedup.HotBucketCap.toLong)
    assert(nHot == 32L, s"expected the 32 cluster buckets hot, got $nHot")
    assert(nCollapsed == 32L * 199L,
      s"expected 32*(200-1) collapsed rows, got $nCollapsed")
    assert(maxBucket == 200L)
    // distinct docs may collide among themselves on a band, but the
    // bucket universe must hold at least the 32 cluster buckets plus
    // the distinct docs' (mostly singleton) buckets
    assert(nBuckets >= 32L + 40L)
    // above the hottest bucket, nothing is guarded
    assert(stats(300L)._2 == 0L && stats(300L)._3 == 0L)
  }

  test("containment dominates jaccard at the same threshold") {
    // containment = inter/min(a,b) >= inter/(a+b-inter) = jaccard, so
    // at equal tau the jaccard pair set is a subset and each kept
    // pair's containment value is >= its jaccard value
    val j = Dedup.ngramJaccard(spark, TestSpark.sf, tau = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val c = Dedup.ngramContainment(spark, TestSpark.sf, tau = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j.keySet.subsetOf(c.keySet))
    assert(j.forall { case (k, jv) => c(k) >= jv })
    assert(j.nonEmpty)
  }
}
