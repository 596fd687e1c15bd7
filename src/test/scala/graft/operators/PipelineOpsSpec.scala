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

  test("bm25 ranks a term-stuffed document first") {
    // rank against a corpus where doc 0's text is exactly the query
    // terms: it must win, and scores must be positive and descending
    val scores = Search.bm25TopK(spark, sf).collect()
    assert(scores.length == 20)
    val s = scores.map(_.getDouble(1))
    assert(s.forall(_ > 0.0))
    assert(s.zip(s.tail).forall { case (x, y) => x >= y })
  }
}
