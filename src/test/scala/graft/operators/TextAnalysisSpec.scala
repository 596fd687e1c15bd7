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
}
