package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partition-batched decode path agrees with the columnar metadata view") {
    val meta = Multimodal.meta(spark, TestSpark.sf)
      .select("doc_id", "width", "height", "format").collect()
    val decoded = Multimodal.decoded(spark, TestSpark.sf).collect()
    assert(meta.length == decoded.length && meta.length > 0)
    meta.zip(decoded).foreach { case (m, d) => assert(m == d) }
  }

  test("stub decode is deterministic in payload size") {
    assert(Multimodal.fakeWidth(100) == Multimodal.fakeWidth(100))
    assert(Multimodal.sniffFormat(99) == "png")
    assert(Multimodal.sniffFormat(100) == "jpeg")
    assert(Multimodal.sniffFormat(101) == "wav")
  }

  test("frame manifest agrees with prep's sample accounting") {
    val prep = Multimodal.prep(spark, TestSpark.sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("stride"),
          r.getAs[Long]("n_samples"))).toMap
    val frames = Multimodal.frameIndex(spark, TestSpark.sf).collect()
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == prep.keySet)
    byDoc.foreach { case (doc, rows) =>
      val (nFrames, stride, nSamples) = prep(doc)
      assert(rows.length.toLong == nSamples, s"doc=$doc")
      val nos = rows.sortBy(_.getAs[Long]("sample_idx"))
        .map(_.getAs[Long]("frame_no"))
      assert(nos.head == 0 && nos.forall(_ < nFrames))
      assert(nos.zip(nos.tail).forall { case (a, b) => b - a == stride })
    }
  }

  test("phash groups bound fingerprints and absorb every exact duplicate") {
    val groups = Multimodal.phashDup(spark, TestSpark.sf).collect()
    assert(groups.nonEmpty)
    assert(groups.forall { g =>
      val h = g.getAs[Long]("phash")
      h >= 0L && g.getAs[Long]("n_docs") >= 2L && h < (1L << 62)
    })
    // identical text => identical fingerprint, so the perceptual
    // grouping must hold at least the exact-duplicate mass
    val exactDupDocs = graft.Tables.documents(spark, TestSpark.sf)
      .groupBy("text").count().filter("count > 1")
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("count"),
        org.apache.spark.sql.functions.lit(0L)))
      .collect().head.getLong(0)
    assert(groups.map(_.getAs[Long]("n_docs")).sum >= exactDupDocs)
  }

  test("frame dedup: ordered pairs, shared count bounded by frame counts") {
    val pairs = Multimodal.frameDedup(spark, TestSpark.sf).collect()
    assert(pairs.forall(p =>
      p.getAs[Long]("a_id") < p.getAs[Long]("b_id") &&
        p.getAs[Long]("n_shared") >= 2L))
    // a pair can share at most min(frames(a), frames(b)) fingerprints
    val nFrames = graft.Tables.documents(spark, TestSpark.sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text").length + 63) / 64).toLong).toMap
    assert(pairs.forall { p =>
      val (a, b) = (p.getAs[Long]("a_id"), p.getAs[Long]("b_id"))
      p.getAs[Long]("n_shared") <= math.min(nFrames(a), nFrames(b))
    })
    // deterministic rerun
    val again = Multimodal.frameDedup(spark, TestSpark.sf).collect()
    assert(pairs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
