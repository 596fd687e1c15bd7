package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class JsonlCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("documents round-trip parquet -> jsonl -> frame losslessly") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val path = tmpDir("graft-jsonl") + "/docs"
    JsonlCorpus.write(docs, path, shards = Some(3))
    val back = JsonlCorpus.readClean(spark, path)
    assert(back.schema.fieldNames.sorted
      .sameElements(docs.schema.fieldNames.sorted))
    assert(back.count() == docs.count())
    // content equality, not just counts: anti-join both directions
    val l = docs.select("doc_id", "text", "lang", "source", "n_chars")
    val r = back.select("doc_id", "text", "lang", "source", "n_chars")
    assert(l.exceptAll(r).count() == 0 && r.exceptAll(l).count() == 0)
  }

  test("malformed lines are quarantined, not fatal") {
    val dir = tmpDir("graft-jsonl-bad")
    val f = new java.io.File(dir, "part-0.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"doc_id": 1, "text": "good line", "lang": "en", "source": "s", "n_chars": 9}""")
    w.println("""{"doc_id": 2, "text": "truncated""") // malformed
    w.println("""not json at all""")
    w.println("""{"doc_id": 3, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}""")
    w.close()
    assert(JsonlCorpus.corruptCount(spark, dir) == 2L)
    val clean = JsonlCorpus.readClean(spark, dir)
    assert(clean.collect().map(_.getAs[Long]("doc_id")).sorted
      .sameElements(Array(1L, 3L)))
    // missing declared fields are null, extra text preserved exactly
    assert(clean.filter(clean("doc_id") === 1L)
      .collect().head.getAs[String]("text") == "good line")
  }
}
