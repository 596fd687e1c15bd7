package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the corpus-hygiene operators added on top of the
  * dedup/similarity family: stratified sampling, benchmark
  * contamination, PII redaction, and BM25 retrieval. Exact
  * cross-engine values are pinned by the DuckDB oracles; these specs
  * pin the properties the oracle can't express (determinism, bounds,
  * ranking sanity).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("stratified sample is deterministic and respects stratum caps") {
    val a = Pipeline.stratifiedSample(spark, sf, cap = 10)
      .collect().map(_.getLong(0)).toSeq
    val b = Pipeline.stratifiedSample(spark, sf, cap = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b) // same rows, same order, every run
    // thinned strata land near the cap (hash threshold is
    // probabilistic, so allow wide slack), never above ~3x
    val perLang = Pipeline.stratifiedSample(spark, sf, cap = 10)
      .groupBy(col("lang")).count().collect().map(_.getLong(1))
    assert(perLang.forall(n => n <= 30), s"stratum blew past cap: ${perLang.toSeq}")
    // a cap above every stratum size keeps everything
    val total = graft.Tables.documents(spark, sf).count()
    assert(Pipeline.stratifiedSample(spark, sf, cap = total).count() == total)
  }

  test("contamination is 1.0 for benchmark duplicates, bounded in [0,1]") {
    val c = Pipeline.contamination(spark, sf)
    val rows = c.collect()
    assert(rows.nonEmpty)
    // benchmark docs themselves are excluded from the screened corpus
    assert(rows.forall(_.getLong(0) % 97 != 0))
    val fracs = rows.map(_.getDouble(3))
    assert(fracs.forall(f => f >= 0.0 && f <= 1.0))
    // overlap never exceeds the doc's own shingle count
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("redaction scrubs every injected email and phone") {
    val out = TextAnalysis.redact(spark, sf)
    assert(out.filter(col("text").rlike("@")).count() == 0)
    assert(out.filter(col("text").rlike("[0-9]{3}-")).count() == 0)
    assert(out.filter(col("text").contains("<EMAIL>")).count() == out.count())
    assert(out.filter(col("text").contains("<PHONE>")).count() == out.count())
  }

  test("fuzzy names: SymSpell candidates are complete vs brute force at k=1") {
    val pairs = Search.fuzzyNames(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.forall { case (a, b, d) => a < b && d == 1L })
    // brute-force ground truth over the (small) distinct-name catalog
    val names = graft.Tables.part(spark, sf)
      .select(col("p_name")).distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val truth = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 1
    } yield (a, b, 1L)).toSet
    assert(pairs.toSet == truth, "deletion-neighborhood join must equal brute force")
    assert(truth.nonEmpty)
  }

  test("name clusters: canonical closed under pairs, singletons map to self") {
    val rows = Search.nameClusters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    // every pair's two names share one canonical representative
    val pairs = Search.fuzzyNames(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(rows(a) == rows(b), s"pair ($a, $b) split across clusters")
    }
    // names in no pair are their own canonical
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    rows.foreach { case (n, c) =>
      if (!inPairs(n)) assert(c == n, s"singleton $n mapped to $c")
      assert(rows(c) == c, s"canonical $c must be its own representative")
    }
  }

  test("bm25 ranks a term-stuffed document first") {
    // rank against a corpus where doc 0's text is exactly the query
    // terms: it must win, and scores must be positive and descending
    val scores = Search.bm25TopK(spark, sf).collect()
    assert(scores.length == 20)
    val s = scores.map(_.getDouble(1))
    assert(s.forall(_ > 0.0))
    assert(s.zip(s.tail).forall { case (x, y) => x >= y })
  }

  test("train split covers every doc once with ~90/5/5 shares") {
    val rows = Pipeline.trainSplit(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length.toLong == total) // every doc, exactly once
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val shares = rows.groupBy(_.getString(1)).view.mapValues(_.length.toDouble / rows.length)
    assert(shares.keySet == Set("train", "val", "test"))
    // hash split on 500 docs: generous bands around 0.90/0.05/0.05
    assert(shares("train") > 0.8 && shares("train") < 0.97, shares.toMap)
    assert(shares("val") < 0.12 && shares("test") < 0.12, shares.toMap)
  }

  test("pack chunks: offsets are per-shard prefix sums and chunks match the budget cut") {
    val rows = Pipeline.packChunks(spark, sf, budget = 100L, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (shard, ms) =>
      val byId = ms.sortBy(_._1)
      var off = 0L
      byId.foreach { case (id, sh, nTok, startOff, chunk) =>
        assert(sh == id % 8)
        assert(startOff == off, s"doc $id in shard $shard: offset $startOff != $off")
        assert(chunk == startOff / 100L)
        off += nTok
      }
    }
  }

  test("mix weights normalize to 1 and temperature compresses the spread") {
    def weights(alpha: Double) = Pipeline.mixWeights(spark, sf, alpha)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val natural = weights(1.0)
    val tempered = weights(0.5)
    assert(math.abs(natural.values.sum - 1.0) < 1e-4)
    assert(math.abs(tempered.values.sum - 1.0) < 1e-4)
    def spread(w: Map[String, Double]) = w.values.max / w.values.min
    // alpha < 1 up-weights small domains: the max/min ratio shrinks
    assert(spread(tempered) <= spread(natural) + 1e-9,
      s"tempered spread ${spread(tempered)} vs natural ${spread(natural)}")
  }

  test("tfidf ranks are dense, scores non-increasing, and stuffed terms surface") {
    val rows = TextAnalysis.tfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length))
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // a token appearing in every document has idf ln((N+1)/(N+1)) = 0
    // and can never be a top term unless everything ties at 0
    val nDocs = rows.map(_._1).distinct.length
    val df = rows.groupBy(_._3).view.mapValues(_.map(_._1).distinct.length)
    assert(rows.map(_._4).forall(_ >= 0.0))
    assert(df.values.forall(_ <= nDocs))
  }

  test("weighted sampling is deterministic, ranked by integer priority, and favors heavy docs") {
    val a = Pipeline.sampleWeighted(spark, TestSpark.sf).collect()
    val b = Pipeline.sampleWeighted(spark, TestSpark.sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // rerun-stable
    // ranks dense 1..k, keys non-decreasing in rank order
    assert(a.map(_.getAs[Long]("rank")).toSeq == (1L to a.length).toSeq)
    val keys = a.map(_.getAs[Long]("key"))
    assert(keys.zip(keys.tail).forall { case (x, y) => x <= y })
    // selection is weight-biased: the sampled docs' mean token weight
    // exceeds the corpus mean (probability ∝ weight)
    val sampleMean = a.map(_.getAs[Long]("weight")).sum.toDouble / a.length
    val corpus = graft.operators.TextAnalysis.tokens(spark, TestSpark.sf)
      .agg(org.apache.spark.sql.functions.avg("ws_tokens")).collect()
      .head.getDouble(0)
    assert(sampleMean > corpus,
      s"sample mean $sampleMean not above corpus mean $corpus")
  }

  test("importance sampling: every doc scored, en docs skew positive") {
    val rows = Pipeline.importanceSample(spark, TestSpark.sf).collect()
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    assert(rows.length == docs.count())
    val langs = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, other) = rows.partition(r => langs(r.getAs[Long]("doc_id")) == "en")
    def meanW(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("weight")).sum / rs.length.max(1)
    // the target slice must score higher on average than the rest —
    // the defining property of the importance weight
    assert(meanW(en) > meanW(other),
      s"en mean ${meanW(en)} <= other mean ${meanW(other)}")
    // keep flag is exactly the weight's sign
    assert(rows.forall(r =>
      (r.getAs[Int]("keep") == 1) == (r.getAs[Double]("weight") >= 0)))
  }

  test("chunking tiles every document with the declared overlap") {
    val chunk = 64
    val stride = 48
    val rows = Pipeline.chunkDocs(spark, sf, chunk, stride).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    val docs = graft.Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.keySet == docs.keySet) // every non-empty doc chunked
    for ((id, cs) <- byDoc) {
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      val n = docs(id).trim.split("\\s+").length.toLong
      // spans: start at idx*stride, capped width, last covers the tail
      assert(sorted.zipWithIndex.forall { case (r, i) =>
        r.getAs[Long]("chunk_idx") == i &&
          r.getAs[Long]("tok_start") == i * stride &&
          r.getAs[Long]("tok_end") == math.min(i.toLong * stride + chunk, n)
      })
      assert(sorted.last.getAs[Long]("tok_end") == n) // full coverage
      assert(sorted.head.getAs[Long]("tok_start") == 0L)
      // chunk text token count equals the span width
      assert(sorted.forall { r =>
        r.getAs[String]("chunk_text").split(" ").length.toLong ==
          r.getAs[Long]("tok_end") - r.getAs[Long]("tok_start")
      })
      // no chunk starts at or past the end (no empty windows)
      assert(sorted.forall(r =>
        r.getAs[Long]("tok_start") < r.getAs[Long]("tok_end")))
    }
  }

  test("quality funnel: cumulative gates are monotone and agree with the projection") {
    val r = Pipeline.qualityFunnel(spark, TestSpark.sf).collect().head
    def g(n: String) = r.getAs[Long](n)
    // first cumulative step IS the first standalone rule
    assert(g("c_word_count") == g("p_word_count"))
    // each gate only removes documents
    val chain = Seq(g("n_docs"), g("c_word_count"), g("c_mean_len"),
      g("c_symbol"), g("c_alpha"), g("n_keep"))
    assert(chain.zip(chain.tail).forall { case (a, b) => b <= a })
    // a cumulative count never exceeds that rule's standalone count
    assert(g("c_mean_len") <= g("p_mean_len") &&
      g("c_symbol") <= g("p_symbol") && g("c_alpha") <= g("p_alpha"))
    // and the funnel agrees with the per-doc projection it aggregates
    val keeps = graft.operators.TextAnalysis
      .gopherRules(spark, graft.TestSpark.sf)
      .agg(org.apache.spark.sql.functions.sum("keep")).collect().head.getLong(0)
    assert(g("n_keep") == keeps)
  }

  test("budget select: never exceeds budget, greedy-maximal, order respected") {
    val budget = 10000L
    val rows = Pipeline.budgetSelect(spark, sf, budget).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("n_tokens"), r.getAs[Int]("keep")))
    val kept = rows.filter(_._4 == 1)
    val dropped = rows.filter(_._4 == 0)
    assert(kept.nonEmpty && dropped.nonEmpty)
    val keptTokens = kept.map(_._3).sum
    assert(keptTokens <= budget)
    // greedy order: every kept doc dominates every dropped doc in
    // (score desc, doc_id asc) order
    val ord = Ordering.Tuple2[Long, Long]
    val worstKept = kept.map(t => (-t._2, t._1)).max(ord)
    val bestDropped = dropped.map(t => (-t._2, t._1)).min(ord)
    assert(ord.lt(worstKept, bestDropped))
    // maximality: the first dropped doc would not have fit
    val firstDropped = dropped.minBy(t => (-t._2, t._1))
    assert(keptTokens + firstDropped._3 > budget)
  }

  test("global shuffle: dense shard positions, epochs reshuffle, rerun-stable") {
    val rows = Pipeline.globalShuffle(spark, graft.TestSpark.sf).collect()
    assert(rows.nonEmpty)
    def layout(shard: String, pos: String) = rows
      .groupBy(_.getAs[Long](shard)).view.mapValues(
        _.map(_.getAs[Long](pos)).sorted.toSeq).toMap
    // every shard's positions are exactly 1..|shard| (dense, no gaps —
    // a reader can stream by position) in both epochs
    Seq(("shard_e1", "pos_e1"), ("shard_e2", "pos_e2")).foreach {
      case (s, p) =>
        layout(s, p).foreach { case (sh, ps) =>
          assert(ps == (1L to ps.length.toLong), s"shard $sh of $s not dense")
        }
    }
    // the two epochs produce genuinely different orders
    assert(rows.exists(r => r.getAs[Long]("shard_e1") != r.getAs[Long]("shard_e2")
      || r.getAs[Long]("pos_e1") != r.getAs[Long]("pos_e2")))
    // no shard is empty and none holds more than half the corpus
    val sizes = layout("shard_e1", "pos_e1").values.map(_.size)
    assert(sizes.size == 8 && sizes.max <= rows.length / 2)
    val again = Pipeline.globalShuffle(spark, graft.TestSpark.sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
