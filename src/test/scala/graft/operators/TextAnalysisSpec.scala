package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("winnowing fingerprint is deterministic and text-sensitive") {
    val a = TextAnalysis.winnowFingerprint("the quick brown fox jumps over the lazy dog")
    val b = TextAnalysis.winnowFingerprint("the quick brown fox jumps over the lazy dog")
    val c = TextAnalysis.winnowFingerprint("the quick brown fox jumps over the lazy cat")
    assert(a == b && a != c)
    assert(TextAnalysis.winnowFingerprint("short") == 0L) // below k-gram size
  }

  test("fingerprint operator covers every document") {
    val df = TextAnalysis.fingerprint(spark, TestSpark.sf)
    assert(df.count() == graft.Tables.documents(spark, TestSpark.sf).count())
  }

  test("winnowing guarantee: a shared k+w-1 substring forces a shared selected gram") {
    // two otherwise-unrelated documents embedding the same 23-char
    // (= k+w-1 for k=8, w=16) passage MUST share a selected gram —
    // this is the Schleimer et al. detection bound substringDup
    // candidates rely on
    val passage = "zqxvkwjmplfrtbndhgycsue" // 23 chars, no repeats
    val a = TextAnalysis.winnowSelectedGrams("AAAA " + passage + " BBBBBBBBBBBB")
    val b = TextAnalysis.winnowSelectedGrams("CCCCCCCCCCCCCC " + passage + " DD")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
    // ...at EVERY window alignment: shift the passage through all w
    // offsets on one side — only a true sliding window holds the bound
    // regardless of alignment (a tumbling selector does not)
    for (off <- 0 until 16) {
      val sa = TextAnalysis.winnowSelectedGrams(("X" * (4 + off)) + " " + passage)
      val sb = TextAnalysis.winnowSelectedGrams(passage + " " + ("Y" * 30))
      assert(sa.toSet.intersect(sb.toSet).nonEmpty,
        s"alignment $off lost the shared passage")
    }
    // below the k-gram size nothing is selected
    assert(TextAnalysis.winnowSelectedGrams("short").isEmpty)
    // selection is a subset of the doc's k-grams, deduped and sorted
    val g = TextAnalysis.winnowSelectedGrams(passage + passage)
    assert(g.distinct.length == g.length && g.sorted.sameElements(g))
    assert(g.forall(_.length == 8))
  }

  test("gopher rules: verdicts follow their metrics") {
    val rows = TextAnalysis.gopherRules(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      assert((r.getAs[Int]("r_word_count") == 1) ==
        (nWords >= 50 && nWords <= 100000))
      assert((r.getAs[Int]("r_symbol") == 1) ==
        (r.getAs[Double]("symbol_ratio") <= 0.1))
      assert((r.getAs[Int]("r_alpha") == 1) ==
        (r.getAs[Double]("alpha_frac") >= 0.8))
      val allRules = Seq("r_word_count", "r_mean_len", "r_symbol",
        "r_alpha", "r_stops").forall(r.getAs[Int](_) == 1)
      assert((r.getAs[Int]("keep") == 1) == allRules)
      assert(r.getAs[Double]("alpha_frac") <= 1.0)
    }
  }

  test("quality metrics are internally consistent") {
    val rows = TextAnalysis.quality(spark, TestSpark.sf).collect()
    rows.foreach { r =>
      val nChars = r.getLong(1); val nWords = r.getLong(2); val nPunct = r.getLong(3)
      assert(nPunct <= nChars)
      assert(nWords >= 0 && (nChars == 0 || nWords <= nChars))
      val ratio = r.getDouble(4)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("language id predicts a code for every doc") {
    val df = TextAnalysis.langId(spark, TestSpark.sf)
    val langs = df.select("predicted_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh", "und")))
    assert(df.count() == graft.Tables.documents(spark, TestSpark.sf).count())
  }

  test("token counts: bpe-ish >= whitespace for punctuated text") {
    val rows = TextAnalysis.tokens(spark, TestSpark.sf).collect()
    rows.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(1) >= 0))
  }

  test("boilerplate: corpus-frequent grams flag docs, verdict is exact integer math") {
    import spark.implicits._
    // 6 docs share the gram "shared header line" (df=6 > dfCap=5);
    // each has 8 distinct grams total (10 words). doc 100 is unique
    // text; doc 101 is too short for any gram; doc 102 is ALL shared.
    val docs = ((0L until 6L).map(i =>
        (i, s"shared header line u$i v$i w$i x$i y$i z$i q$i")) ++
      Seq((100L, "completely different words here nothing shared at all ok"),
          (101L, "two words"),
          (102L, "shared header line")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateOn(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(4))).toMap
    (0L until 6L).foreach { i =>
      val (n, b, act) = out(i)
      // 1 of 8 grams is boilerplate: 12.5% >= dropPct 8%
      assert(n == 8 && b == 1 && act == "drop")
    }
    assert(out(100L) == ((7L, 0L, "keep")))
    assert(out(101L) == ((0L, 0L, "keep")))
    assert(out(102L) == ((1L, 1L, "drop")))
  }

  test("perplexity buckets: per-lang terciles are balanced and ordered by score") {
    val rows = TextAnalysis.pplBuckets(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byT = rs.groupBy(_.getAs[Long]("tercile")).view
        .mapValues(_.map(_.getAs[Double]("mean_logprob")))
      // ntile balance: sizes differ by at most 1
      val sizes = byT.values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"$lang terciles $sizes")
      // head scores >= middle >= tail (boundaries can tie)
      if (byT.contains(1L) && byT.contains(3L))
        assert(byT(1L).min >= byT(3L).max,
          s"$lang head/tail ordering violated")
    }
    val names = rows.map(r => r.getAs[Long]("tercile") ->
      r.getAs[String]("bucket")).toMap
    assert(names.forall { case (t, b) =>
      b == Seq("head", "middle", "tail")(t.toInt - 1) })
  }

  test("quality model: every doc scored, score bounded by weights, keep = sign") {
    val rows = TextAnalysis.qualityModel(spark, TestSpark.sf).collect()
    val total = graft.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.length.toLong == total)
    // |score| <= 100 * n_tokens (weights live in [-100, 100])
    assert(rows.forall { r =>
      math.abs(r.getAs[Long]("score")) <= 100L * r.getAs[Long]("n_tokens")
    })
    assert(rows.forall { r =>
      (r.getAs[Int]("keep") == 1) == (r.getAs[Long]("score") >= 0L)
    })
    // n_tokens agrees with the corpus-wide whitespace convention
    val ws = TextAnalysis.tokens(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("ws_tokens")).toMap
    assert(rows.forall(r =>
      r.getAs[Long]("n_tokens") == ws(r.getAs[Long]("doc_id"))))
    // rerun-stable (deterministic stub weights, integer arithmetic)
    val again = TextAnalysis.qualityModel(spark, TestSpark.sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("bpe merge rewrite: left-to-right non-overlapping, both replace dialects") {
    // the engine relies on Spark's `replace` and DuckDB's `replace`
    // agreeing on self-overlapping patterns: " a a a " under merge
    // (a,a) must become " aa a " (first occurrence consumed, scan
    // resumes after it), never " a aa " or " aa aa "
    import spark.implicits._
    val out = Seq(" a a a ").toDF("r")
      .selectExpr("replace(r, ' a a ', concat(' ', 'aa', ' ')) AS m")
      .collect()(0).getString(0)
    assert(out == " aa a ")
  }

  test("bpe training learns the dominant pair first and is rerun-stable") {
    val rules = TextAnalysis.bpeTrain(spark, TestSpark.sf, rounds = 4).collect()
    assert(rules.length == 4)
    assert(rules.map(_.getAs[Long]("round")).toSeq == Seq(1L, 2L, 3L, 4L))
    // each rule's merged form is its pair with the separator dropped
    assert(rules.forall(r =>
      r.getAs[String]("merged") == r.getAs[String]("pair").replace(" ", "")))
    // counts are monotonically available (a later round can never
    // exceed the first round's max: merges only remove occurrences)
    val counts = rules.map(_.getAs[Long]("cnt"))
    assert(counts.forall(_ > 0) && counts.tail.forall(_ <= counts.head))
    val again = TextAnalysis.bpeTrain(spark, TestSpark.sf, rounds = 4).collect()
    assert(rules.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("novelty: first doc fully novel, shingle mass conserved, rates bounded") {
    val rows = TextAnalysis.novelty(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (n, nov) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"))
      n >= 1L && nov >= 0L && nov <= n &&
        math.abs(r.getAs[Double]("novelty") -
          math.round(nov.toDouble / n * 1e6) / 1e6) < 1e-12
    })
    // the smallest doc_id owns every one of its shingles by definition
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_shingles"))
    // total novel shingles across docs = globally distinct shingles
    val distinctShingles = graft.Tables.documents(spark, TestSpark.sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect()
      .flatMap(r => Dedup.shingleHashesJvm(r.getString(1)).distinct)
      .distinct.length.toLong
    assert(rows.map(_.getAs[Long]("n_novel")).sum == distinctShingles)
  }

  test("bpe encode: every merge removes one symbol, rules actually fire") {
    val rows = TextAnalysis.bpeEncode(spark, TestSpark.sf, rounds = 4).collect()
    assert(rows.nonEmpty)
    // each applied merge collapses two symbols into one, so the token
    // count can only shrink from the char count, never below the word
    // count (a word can't merge past a single symbol), and the ratio
    // tracks the integer counts exactly
    rows.foreach { r =>
      val (s0, nt) = (r.getAs[Long]("n_sym0"), r.getAs[Long]("n_tokens"))
      assert(nt <= s0 && (s0 == 0L || nt > 0L))
      val c = r.getAs[Double]("compression")
      if (s0 > 0) assert(math.abs(c - math.round(nt.toDouble / s0 * 1e6) / 1e6) < 1e-12)
    }
    // the trained rules fire on the corpus they were trained on
    assert(rows.exists(r =>
      r.getAs[Long]("n_tokens") < r.getAs[Long]("n_sym0")))
    // rerun-stable (deterministic training + deterministic rewrite)
    val again = TextAnalysis.bpeEncode(spark, TestSpark.sf, rounds = 4).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("bigram LM: scores every multi-token doc, logprobs negative, count right") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val scored = TextAnalysis.bigramLogprob(spark, TestSpark.sf)
    val rows = scored.collect()
    // every doc with >= 2 tokens gets a score; mean log-conditional-
    // probability of a smoothed model is strictly negative
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("mean_logprob") < 0.0))
    assert(rows.forall(_.getAs[Long]("n_bigrams") > 0L))
    // n_bigrams == token count - 1 for a spot-checked doc
    val spot = docs.selectExpr("doc_id",
        "size(filter(split(lower(trim(text)), '\\\\s+'), x -> length(x) > 0)) AS nt")
      .filter("nt >= 2").limit(1).collect().head
    val got = rows.find(_.getAs[Long]("doc_id") == spot.getAs[Long]("doc_id")).get
    assert(got.getAs[Long]("n_bigrams") == spot.getAs[Int]("nt") - 1L)
  }

  test("zipf slope: negative, rerun-stable, and built from exactly m ranks") {
    val r = TextAnalysis.zipfSlope(spark, TestSpark.sf, m = 20).collect().head
    assert(r.getAs[Long]("n") == 20L)
    // frequency is non-increasing in rank, so the LS slope can't be
    // positive on any real corpus
    assert(r.getAs[Double]("slope") < 0.0)
    val again = TextAnalysis.zipfSlope(spark, TestSpark.sf, m = 20).collect().head
    assert(r.toSeq == again.toSeq)
  }
}
