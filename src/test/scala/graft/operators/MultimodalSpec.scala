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
}
